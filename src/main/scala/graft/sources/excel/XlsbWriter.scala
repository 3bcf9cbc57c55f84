package graft.sources.excel

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import Biff12._

/** Minimal BIFF12 (xlsb) writer for fixtures — the binary sibling of
  * XlsxWriter, emitting the record subset the scan path consumes
  * (BrtBundleSh / BrtWsDim / BrtRowHdr / cell records / BrtSSTItem) with
  * MS-XLSB framing. Reuses XlsxWriter's cell model so the same fixture
  * definition can be written in both formats and cross-checked.
  */
object XlsbWriter {

  import XlsxWriter._

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def f64le(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray
  }

  private def wideString(s: String): Array[Byte] =
    le32(s.length) ++ s.getBytes(StandardCharsets.UTF_16LE)

  private val errorCodes = Map(
    "#NULL!" -> 0x00, "#DIV/0!" -> 0x07, "#VALUE!" -> 0x0F, "#REF!" -> 0x17,
    "#NAME?" -> 0x1D, "#NUM!" -> 0x24, "#N/A" -> 0x2A, "#GETTING_DATA" -> 0x2B)

  def write(path: String, sheets: Seq[Sheet]): Unit = {
    val shared = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int = shared.getOrElseUpdate(s, shared.size)

    val sheetBins = sheets.map { sheet =>
      val out = new ByteArrayOutputStream()
      if (sheet.cells.nonEmpty) {
        val rs = sheet.cells.keys.map(_._1)
        val cs = sheet.cells.keys.map(_._2)
        writeRecord(out, BrtWsDim, le32(rs.min) ++ le32(rs.max) ++ le32(cs.min) ++ le32(cs.max))
      }
      writeRecord(out, BrtBeginSheetData, Array.empty)
      sheet.cells.groupBy(_._1._1).toSeq.sortBy(_._1).foreach { case (r, cells) =>
        // BrtRowHdr: rw + ixfe + miyRw + flags (only rw is consumed)
        writeRecord(out, BrtRowHdr, le32(r) ++ new Array[Byte](13))
        cells.toSeq.sortBy(_._1._2).foreach { case ((_, c), cell) =>
          val head = le32(c) ++ le32(0) // col + iStyleRef/fPhShow
          cell match {
            case XNum(v) =>
              // exercise both numeric encodings: integral values that fit
              // 30 bits go out as RK ints, everything else as IEEE doubles
              val asInt = v.toLong
              if (v == asInt && asInt >= -(1L << 29) && asInt < (1L << 29))
                writeRecord(out, BrtCellRk, head ++ le32((asInt.toInt << 2) | 0x2))
              else
                writeRecord(out, BrtCellReal, head ++ f64le(v))
            case XStr(s)        => writeRecord(out, BrtCellSt, head ++ wideString(s))
            case XFormulaStr(s) => writeRecord(out, BrtFmlaString, head ++ wideString(s))
            case XShared(s)     => writeRecord(out, BrtCellIsst, head ++ le32(sharedIdx(s)))
            case XBool(b)       => writeRecord(out, BrtCellBool, head :+ (if (b) 1 else 0).toByte)
            case XErr(code)     => writeRecord(out, BrtCellError, head :+ errorCodes(code).toByte)
            case XIsoDate(s)    => writeRecord(out, BrtCellSt, head ++ wideString(s)) // xlsb has no ISO cell type
            case XEmpty         => writeRecord(out, BrtCellBlank, head)
          }
        }
      }
      writeRecord(out, BrtEndSheetData, Array.empty)
      out.toByteArray
    }

    val workbookBin = {
      val out = new ByteArrayOutputStream()
      sheets.zipWithIndex.foreach { case (s, i) =>
        val payload = le32(0) ++ le32(i + 1) ++
          wideString(s"rId${i + 1}") ++ wideString(s.name)
        writeRecord(out, BrtBundleSh, payload)
      }
      out.toByteArray
    }

    val sstBin = {
      val out = new ByteArrayOutputStream()
      writeRecord(out, BrtBeginSst, le32(shared.size) ++ le32(shared.size))
      shared.keys.foreach { s =>
        writeRecord(out, BrtSSTItem, Array(0.toByte) ++ wideString(s))
      }
      out.toByteArray
    }

    val workbookRels = {
      val rels = sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.bin"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""".stripMargin
    }

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: Array[Byte]): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content)
        zos.closeEntry()
      }
      put("xl/workbook.bin", workbookBin)
      put("xl/_rels/workbook.bin.rels", workbookRels.getBytes(StandardCharsets.UTF_8))
      sheetBins.zipWithIndex.foreach { case (bin, i) =>
        put(s"xl/worksheets/sheet${i + 1}.bin", bin)
      }
      put("xl/sharedStrings.bin", sstBin)
    } finally zos.close()
  }
}
