package graft.sources.excel

/** Format-independent workbook access: the conversion semantics in
  * ExcelRead run identically over xlsx (XML) and xlsb (BIFF12) parts.
  */
trait WorkbookSource extends AutoCloseable {
  def resolveSheet(name: Option[String], index: Option[Int]): XlsxParser.SheetMeta
  def dimensions(target: String): Option[XlsxParser.Dimensions]
  def cells(target: String): Iterator[XlsxParser.Cell] with AutoCloseable

  /** Cell stream for full-sheet scans; formats with a parallel fast path
    * (xlsx) override this. Semantics identical to [[cells]].
    */
  def cellsForScan(target: String): Iterator[XlsxParser.Cell] with AutoCloseable =
    cells(target)

  /** Splittable-scan planning: one pass over the inflated sheet part
    * that spills its bytes into ≤ `n` row-aligned chunk files under
    * `scratch` (cut exactly at row-start boundaries, so each chunk is a
    * self-describing run of complete rows). Nil = no rows (caller falls
    * back to the serial scan). Total inflate work is ONE pass for any
    * `n`.
    */
  def spillRowChunks(target: String, n: Int, scratch: java.nio.file.Path): Seq[String]

  /** Cell stream over one chunk file spilled by [[spillRowChunks]]. */
  def chunkCells(chunkPath: String): Iterator[XlsxParser.Cell] with AutoCloseable
}

object WorkbookSource {
  def open(path: String): WorkbookSource =
    if (path.toLowerCase.endsWith(".xlsb")) new XlsbParser.Workbook(path)
    else new XlsxParser.Workbook(path)
}
