package graft.sources.excel

import java.util.zip.ZipFile

import scala.collection.mutable

import Biff12._

/** Streaming xlsb (BIFF12) reader — second decoder behind the same DSv2
  * source (R2, /root/reference/src/lib.rs:68-102). The container is a ZIP
  * with binary parts (workbook.bin, worksheets/sheetN.bin,
  * sharedStrings.bin); record layouts follow the public MS-XLSB spec.
  * Cell stringification matches the xlsx path exactly (Rust float
  * formatting, bool words, calamine error names, null-vs-"" semantics).
  */
object XlsbParser {

  import XlsxParser.{Cell, Dimensions, SheetMeta, U8Empty, U8False, U8True}

  final class Workbook(val path: String) extends WorkbookSource {
    private val zip = new ZipFile(path)

    private def entryStream(name: String) =
      Option(zip.getEntry(name)).map(zip.getInputStream)

    val sheets: Seq[SheetMeta] = {
      val rels: Map[String, String] = entryStream("xl/_rels/workbook.bin.rels")
        .map(XlsxParser.parseRels)
        .getOrElse(Map.empty)
      val in = entryStream("xl/workbook.bin").getOrElse(
        throw new IllegalArgumentException(s"$path: xl/workbook.bin missing — not an xlsb file"))
      val out = mutable.ArrayBuffer.empty[SheetMeta]
      val r = new Reader(in)
      try {
        r.foreach { rec =>
          if (rec.id == BrtBundleSh) {
            val c = new Cursor(rec.payload)
            c.skip(8) // hsState(4) + iTabID(4)
            val relId = c.nullableWideString()
            val name = c.wideString()
            val target = relId.flatMap(rels.get) match {
              case Some(t) if t.startsWith("/") => t.drop(1)
              case Some(t)                      => s"xl/$t"
              case None => s"xl/worksheets/sheet${out.size + 1}.bin"
            }
            out += SheetMeta(name, target)
          }
        }
      } finally r.close()
      out.toSeq
    }

    lazy val sharedStrings: IndexedSeq[org.apache.spark.unsafe.types.UTF8String] =
      entryStream("xl/sharedStrings.bin") match {
        case None => IndexedSeq.empty
        case Some(in) =>
          val out = mutable.ArrayBuffer.empty[org.apache.spark.unsafe.types.UTF8String]
          val r = new Reader(in)
          try {
            r.foreach { rec =>
              if (rec.id == BrtSSTItem) {
                val c = new Cursor(rec.payload)
                c.skip(1) // richStr flags
                out += org.apache.spark.unsafe.types.UTF8String.fromString(c.wideString())
              }
            }
          } finally r.close()
          out.toIndexedSeq
      }

    override def resolveSheet(name: Option[String], index: Option[Int]): SheetMeta =
      name match {
        case Some(n) =>
          sheets.find(_.name == n).getOrElse(
            throw new IllegalArgumentException(s"Worksheet '$n' not found"))
        case None => index match {
          case Some(i) =>
            if (i < 0 || i >= sheets.length)
              throw new IllegalArgumentException(
                s"Sheet index $i out of bounds (${sheets.length} sheets)")
            sheets(i)
          case None =>
            sheets.headOption.getOrElse(
              throw new IllegalArgumentException("No worksheets found"))
        }
      }

    override def dimensions(target: String): Option[Dimensions] = {
      val in = entryStream(target).getOrElse(
        throw new IllegalArgumentException(s"$path: missing worksheet part $target"))
      val r = new Reader(in)
      try {
        var dim: Option[Dimensions] = None
        var scanning = true
        while (scanning && r.hasNext) {
          val rec = r.next()
          if (rec.id == BrtWsDim) {
            val c = new Cursor(rec.payload)
            val r0 = c.i32(); val r1 = c.i32(); val c0 = c.i32(); val c1 = c.i32()
            dim = Some(Dimensions(r0, c0, r1, c1))
            scanning = false
          } else if (rec.id == BrtBeginSheetData) scanning = false
        }
        dim.orElse {
          // no BrtWsDim: fall back to a full scan for bounds
          var r0, c0 = Int.MaxValue
          var r1, c1 = Int.MinValue
          val it = cells(target)
          try it.foreach { cell =>
            r0 = math.min(r0, cell.row); c0 = math.min(c0, cell.col)
            r1 = math.max(r1, cell.row); c1 = math.max(c1, cell.col)
          } finally it.close()
          if (r0 == Int.MaxValue) None else Some(Dimensions(r0, c0, r1, c1))
        }
      } finally r.close()
    }

    override def cells(target: String): Iterator[Cell] with AutoCloseable = {
      val in = entryStream(target).getOrElse(
        throw new IllegalArgumentException(s"$path: missing worksheet part $target"))
      new CellIterator(new Reader(in), sharedStrings)
    }

    /** Single-pass splittable-scan planner for BIFF12 (the binary
      * sibling of XlsxParser.spillRowChunks): records are
      * length-prefixed, so one record walk over the inflated part
      * tracks every record's start offset and spills the bytes into
      * row-aligned chunk files, rotating exactly at the first
      * `BrtRowHdr` record at or past each even-split target offset.
      * Every chunk therefore begins with a BrtRowHdr — whose payload
      * carries the ABSOLUTE row id, so chunk parsing needs no preceding
      * context (the property the xlsx path needs r= attributes for,
      * BIFF12 gives structurally). The prefix before the first row
      * (BrtWsDim, BrtBeginSheetData, ...) is not spilled; the
      * CellIterator ignores structural records and stops at
      * BrtEndSheetData in the final chunk. Only the 1-3 framing-varint
      * bytes per record go through per-byte reads (on a
      * BufferedInputStream); payloads move in bulk — the per-inflated-
      * byte read cliff rowSplits documents does not apply.
      */
    override def spillRowChunks(
        target: String, n: Int, scratch: java.nio.file.Path): Seq[String] = {
      val entry = zip.getEntry(target)
      if (entry == null)
        throw new IllegalArgumentException(s"$path: missing worksheet part $target")
      val total = entry.getSize
      if (total <= 0 || n <= 1) return Nil
      val targets = (1 until n).map(i => total * i / n)
      val files = mutable.ArrayBuffer.empty[java.io.File]
      var out: java.io.OutputStream = null
      def rotate(): Unit = {
        if (out != null) out.close()
        val f = scratch.resolve(f"chunk-${files.size}%05d.bin").toFile
        f.deleteOnExit()
        files += f
        out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 16)
      }
      val in = new java.io.BufferedInputStream(zip.getInputStream(entry), 1 << 16)
      try {
        var off = 0L
        var ti = 0
        var firstSeen = false
        val head = new java.io.ByteArrayOutputStream(8)
        def readHeadByte(): Int = {
          val b = in.read()
          if (b >= 0) { off += 1; head.write(b) }
          b
        }
        var done = false
        while (!done) {
          head.reset()
          val recStart = off
          val b0 = readHeadByte()
          if (b0 < 0) done = true
          else {
            val id =
              if ((b0 & 0x80) == 0) b0
              else {
                val b1 = readHeadByte()
                if (b1 < 0) throw new java.io.EOFException(
                  s"$path:$target: truncated BIFF12 record id")
                (b0 & 0x7f) | ((b1 & 0x7f) << 7)
              }
            var size = 0
            var shift = 0
            var more = true
            var i = 0
            while (more && i < 4) {
              val b = readHeadByte()
              if (b < 0) throw new java.io.EOFException(
                s"$path:$target: truncated BIFF12 record size")
              size |= (b & 0x7f) << shift
              more = (b & 0x80) != 0
              shift += 7
              i += 1
            }
            val payload = new Array[Byte](size)
            var got = 0
            while (got < size) {
              val k = in.read(payload, got, size - got)
              if (k < 0) throw new java.io.EOFException(
                s"$path:$target: truncated BIFF12 payload")
              got += k
            }
            off += size
            if (id == BrtRowHdr) {
              if (!firstSeen) { firstSeen = true; rotate() }
              else if (ti < targets.length && recStart >= targets(ti)) rotate()
              while (ti < targets.length && recStart >= targets(ti)) ti += 1
            }
            if (firstSeen) { head.writeTo(out); out.write(payload) }
          }
        }
      } finally {
        if (out != null) out.close()
        in.close()
      }
      files.map(_.getAbsolutePath).toSeq
    }

    /** Cell stream over one spilled BIFF12 chunk (see
      * [[spillRowChunks]]): a run of complete records starting at a
      * BrtRowHdr, parsed by the ordinary record reader.
      */
    override def chunkCells(chunkPath: String): CellIterator = {
      val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(chunkPath), 1 << 16)
      new CellIterator(new Reader(in), sharedStrings)
    }

    override def close(): Unit = zip.close()
  }

  final class CellIterator(r: Reader, shared: IndexedSeq[org.apache.spark.unsafe.types.UTF8String])
      extends Iterator[Cell] with AutoCloseable {

    private var curRow = -1
    private var nextCell: Cell = _
    private var finished = false

    private def advance(): Unit = {
      nextCell = null
      while (nextCell == null && !finished) {
        if (!r.hasNext) { finished = true; close(); return }
        val rec = r.next()
        rec.id match {
          case BrtRowHdr =>
            curRow = new Cursor(rec.payload).i32()
          case BrtCellBlank | BrtCellRk | BrtCellError | BrtCellBool |
               BrtCellReal | BrtCellSt | BrtCellIsst | BrtFmlaString |
               BrtFmlaNum | BrtFmlaBool | BrtFmlaError =>
            val c = new Cursor(rec.payload)
            val col = c.i32()
            c.skip(4) // iStyleRef (3 bytes) + fPhShow/reserved (1 byte)
            import org.apache.spark.unsafe.types.UTF8String
            val text = rec.id match {
              case BrtCellBlank => U8Empty
              case BrtCellRk    => UTF8String.fromString(RustDouble.format(decodeRk(c.i32())))
              case BrtCellError | BrtFmlaError => UTF8String.fromString(errorName(c.u8()))
              case BrtCellBool | BrtFmlaBool => if (c.u8() != 0) U8True else U8False
              case BrtCellReal | BrtFmlaNum  => UTF8String.fromString(RustDouble.format(c.f64()))
              case BrtCellSt | BrtFmlaString => UTF8String.fromString(c.wideString())
              case BrtCellIsst =>
                val idx = c.i32()
                if (idx >= 0 && idx < shared.length) shared(idx) else U8Empty
            }
            nextCell = Cell(curRow, col, text)
          case BrtEndSheetData => finished = true; close()
          case _ => // skip structural records
        }
      }
    }

    advance()
    override def hasNext: Boolean = nextCell != null
    override def next(): Cell = {
      val cell = nextCell
      if (cell == null) throw new NoSuchElementException
      advance()
      cell
    }
    override def close(): Unit = r.close()
  }
}
