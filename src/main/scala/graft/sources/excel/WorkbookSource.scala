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
}

object WorkbookSource {
  def open(path: String): WorkbookSource =
    if (path.toLowerCase.endsWith(".xlsb")) new XlsbParser.Workbook(path)
    else new XlsxParser.Workbook(path)
}
