package graft

/** Lossless JSON string escaping, shared by every driver-consumed
  * artifact writer (Verify's oracle_sql.json / verify_errors.json,
  * Bench's {"err": ...} entries): backslash, quote, \n \r \t, and
  * \uXXXX for all remaining control characters. One escaping semantic —
  * a tab or CR in builder-authored SQL or an exception message must
  * never make the driver's json.load fail or lose message fidelity.
  */
object JsonText {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""
}
