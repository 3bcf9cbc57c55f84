package graft.sources.excel

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal SpreadsheetML writer — produces the xlsx fixtures the golden
  * tests convert (the reference's own samples are gitignored and don't
  * ship, /root/reference/.gitignore:2). Supports every cell variant the
  * reference's cell_to_string distinguishes (/root/reference/src/lib.rs:387-400)
  * plus absent cells and absent rows, so the null-vs-"" semantics are
  * testable.
  */
object XlsxWriter {

  sealed trait XCell
  final case class XNum(v: Double) extends XCell
  final case class XStr(s: String) extends XCell           // inline string
  final case class XShared(s: String) extends XCell        // shared-strings table
  final case class XFormulaStr(s: String) extends XCell    // t="str" cached formula text
  final case class XBool(b: Boolean) extends XCell
  final case class XErr(code: String) extends XCell        // e.g. "#DIV/0!"
  final case class XIsoDate(s: String) extends XCell       // t="d" literal ISO text
  case object XEmpty extends XCell                         // <c/> present, no value

  /** One sheet: name + sparse grid. Row/col indices are 0-based absolute
    * sheet coordinates; rows and cells may be missing entirely.
    */
  final case class Sheet(name: String, cells: Map[(Int, Int), XCell])

  object Sheet {
    /** Dense helper: rows of Option[XCell] laid out from (startRow, startCol). */
    def dense(name: String, rows: Seq[Seq[Option[XCell]]], startRow: Int = 0, startCol: Int = 0): Sheet =
      Sheet(name, (for {
        (row, ri) <- rows.zipWithIndex
        (cell, ci) <- row.zipWithIndex
        c <- cell
      } yield (startRow + ri, startCol + ci) -> c).toMap)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  def colName(c: Int): String = {
    var n = c + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def numText(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  def write(path: String, sheets: Seq[Sheet]): Unit = {
    val shared = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int = shared.getOrElseUpdate(s, shared.size)

    val sheetXmls = sheets.map { sheet =>
      val byRow = sheet.cells.groupBy(_._1._1).toSeq.sortBy(_._1)
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">"""
      if (sheet.cells.nonEmpty) {
        val rs = sheet.cells.keys.map(_._1)
        val cs = sheet.cells.keys.map(_._2)
        val dimRef = s"${colName(cs.min)}${rs.min + 1}:${colName(cs.max)}${rs.max + 1}"
        sb ++= s"""<dimension ref="$dimRef"/>"""
      }
      sb ++= "<sheetData>"
      byRow.foreach { case (r, cells) =>
        sb ++= s"""<row r="${r + 1}">"""
        cells.toSeq.sortBy(_._1._2).foreach { case ((_, c), cell) =>
          val ref = s"${colName(c)}${r + 1}"
          cell match {
            case XNum(v)        => sb ++= s"""<c r="$ref"><v>${numText(v)}</v></c>"""
            case XStr(s)        => sb ++= s"""<c r="$ref" t="inlineStr"><is><t>${esc(s)}</t></is></c>"""
            case XShared(s)     => sb ++= s"""<c r="$ref" t="s"><v>${sharedIdx(s)}</v></c>"""
            case XFormulaStr(s) => sb ++= s"""<c r="$ref" t="str"><v>${esc(s)}</v></c>"""
            case XBool(b)       => sb ++= s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
            case XErr(code)     => sb ++= s"""<c r="$ref" t="e"><v>${esc(code)}</v></c>"""
            case XIsoDate(s)    => sb ++= s"""<c r="$ref" t="d"><v>${esc(s)}</v></c>"""
            case XEmpty         => sb ++= s"""<c r="$ref"/>"""
          }
        }
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      sb.toString
    }

    val workbook = {
      val entries = sheets.zipWithIndex.map { case (s, i) =>
        s"""<sheet name="${esc(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>$entries</sheets></workbook>""".stripMargin
    }
    val workbookRels = {
      val rels = sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      val ssRel = s"""<Relationship Id="rId${sheets.length + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>"""
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels$ssRel</Relationships>""".stripMargin
    }
    val sharedXml = {
      val sis = shared.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${shared.size}" uniqueCount="${shared.size}">$sis</sst>""".stripMargin
    }
    val contentTypes = {
      val overrides = sheets.indices.map { i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
         |$overrides</Types>""".stripMargin
    }
    val rootRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
         |</Relationships>""".stripMargin

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes(StandardCharsets.UTF_8))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", workbookRels)
      sheetXmls.zipWithIndex.foreach { case (xml, i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", xml)
      }
      put("xl/sharedStrings.xml", sharedXml)
    } finally zos.close()
  }
}
