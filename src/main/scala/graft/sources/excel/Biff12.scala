package graft.sources.excel

import java.io.{EOFException, InputStream, OutputStream}

/** BIFF12 (MS-XLSB) record framing: every record is
  *   [record id: 1-2 byte varint][payload size: 1-4 byte varint][payload].
  * Both varints carry 7 bits per byte with the high bit as continuation.
  * Record ids and payload layouts follow the public MS-XLSB specification
  * (the reference reads the same format via calamine,
  * /root/reference/src/lib.rs:68-102).
  */
object Biff12 {

  // record ids used by the scan path (MS-XLSB §2.3)
  val BrtRowHdr       = 0x00
  val BrtCellBlank    = 0x01
  val BrtCellRk       = 0x02
  val BrtCellError    = 0x03
  val BrtCellBool     = 0x04
  val BrtCellReal     = 0x05
  val BrtCellSt       = 0x06
  val BrtCellIsst     = 0x07
  val BrtFmlaString   = 0x08
  val BrtFmlaNum      = 0x09
  val BrtFmlaBool     = 0x0A
  val BrtFmlaError    = 0x0B
  val BrtSSTItem      = 0x13
  val BrtWsDim        = 0x94
  val BrtBeginSheetData = 0x91
  val BrtEndSheetData = 0x92
  val BrtBundleSh     = 0x9C
  val BrtBeginSst     = 0x9F

  final case class Record(id: Int, payload: Array[Byte])

  /** Streaming record reader. */
  final class Reader(in: InputStream) extends Iterator[Record] with AutoCloseable {
    private var nextRec: Record = _
    private var done = false

    private def readByte(): Int = in.read()

    private def readId(): Int = {
      val b0 = readByte()
      if (b0 < 0) return -1
      if ((b0 & 0x80) == 0) b0
      else {
        val b1 = readByte()
        if (b1 < 0) throw new EOFException("truncated BIFF12 record id")
        (b0 & 0x7f) | ((b1 & 0x7f) << 7)
      }
    }

    private def readSize(): Int = {
      var shift = 0
      var size = 0
      var i = 0
      while (i < 4) {
        val b = readByte()
        if (b < 0) throw new EOFException("truncated BIFF12 record size")
        size |= (b & 0x7f) << shift
        if ((b & 0x80) == 0) return size
        shift += 7
        i += 1
      }
      size
    }

    private def advance(): Unit = {
      nextRec = null
      if (done) return
      val id = readId()
      if (id < 0) { done = true; return }
      val size = readSize()
      val payload = new Array[Byte](size)
      var off = 0
      while (off < size) {
        val n = in.read(payload, off, size - off)
        if (n < 0) throw new EOFException("truncated BIFF12 payload")
        off += n
      }
      nextRec = Record(id, payload)
    }

    advance()
    override def hasNext: Boolean = nextRec != null
    override def next(): Record = {
      val r = nextRec
      if (r == null) throw new NoSuchElementException
      advance()
      r
    }
    override def close(): Unit = in.close()
  }

  /** Little-endian payload cursor. */
  final class Cursor(buf: Array[Byte]) {
    private var pos = 0
    def skip(n: Int): Unit = pos += n
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def i32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    def f64(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    /** XLWideString: i32 char count + UTF-16LE. */
    def wideString(): String = {
      val n = i32()
      if (n <= 0) return ""
      val s = new String(buf, pos, n * 2, java.nio.charset.StandardCharsets.UTF_16LE)
      pos += n * 2
      s
    }
    /** XLNullableWideString: 0xFFFFFFFF length = null. */
    def nullableWideString(): Option[String] = {
      val n = i32()
      if (n == -1) None
      else {
        val s = new String(buf, pos, n * 2, java.nio.charset.StandardCharsets.UTF_16LE)
        pos += n * 2
        Some(s)
      }
    }
    def remaining: Int = buf.length - pos
  }

  /** RK number decoding (MS-XLSB §2.5.122): bit0 = /100, bit1 = int flag;
    * int: top 30 bits as signed >> 2; float: top 30 bits are the high 30
    * bits of an IEEE double.
    */
  def decodeRk(rk: Int): Double = {
    val fx100 = (rk & 0x1) != 0
    val fInt = (rk & 0x2) != 0
    val v =
      if (fInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if (fx100) v / 100.0 else v
  }

  /** BrtCellError / BrtFmlaError code → calamine Debug name (matches the
    * xlsx path's mapError).
    */
  def errorName(code: Int): String = code match {
    case 0x00 => "Null"
    case 0x07 => "Div0"
    case 0x0F => "Value"
    case 0x17 => "Ref"
    case 0x1D => "Name"
    case 0x24 => "Num"
    case 0x2A => "NA"
    case 0x2B => "GettingData"
    case other => s"Error($other)"
  }

  // ----------------------------------------------------------- writing
  // (fixture generation; real files from Excel follow the same framing)

  def writeVarintId(out: OutputStream, id: Int): Unit = {
    if (id < 0x80) out.write(id)
    else { out.write((id & 0x7f) | 0x80); out.write((id >> 7) & 0x7f) }
  }

  def writeVarintSize(out: OutputStream, size0: Int): Unit = {
    var size = size0
    var more = true
    while (more) {
      val b = size & 0x7f
      size >>= 7
      more = size != 0
      out.write(if (more) b | 0x80 else b)
    }
  }

  def writeRecord(out: OutputStream, id: Int, payload: Array[Byte]): Unit = {
    writeVarintId(out, id)
    writeVarintSize(out, payload.length)
    out.write(payload)
  }
}
