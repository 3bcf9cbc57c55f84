package graft.sources.excel

/** Shortest-round-trip decimal formatting of a double, matching Rust's
  * `f64` `Display` (`{}`), which the reference uses to stringify numeric
  * and datetime-serial cells (/root/reference/src/lib.rs:390,394).
  *
  * Rust semantics we replicate:
  *   - shortest decimal digit string that round-trips to the same double;
  *   - plain positional notation, never scientific (1e300 prints all 301
  *     digits; 1e-10 prints 0.0000000001);
  *   - integral values print WITHOUT a trailing ".0" (1.0 -> "1") — unlike
  *     Java's Double.toString which yields "1.0";
  *   - "-0" for negative zero, "NaN"/"inf"/"-inf" for specials.
  *
  * Implementation: probe precisions 1..17 with %.*e (Java's formatter is
  * correctly rounded) and take the first that parses back equal; then
  * expand mantissa/exponent into plain decimal.
  */
object RustDouble {

  def format(v: Double): String = {
    if (java.lang.Double.isNaN(v)) return "NaN"
    if (v == Double.PositiveInfinity) return "inf"
    if (v == Double.NegativeInfinity) return "-inf"
    if (v == 0.0d) return if (1.0d / v < 0) "-0" else "0"

    val neg = v < 0 || (v == 0.0d && 1.0d / v < 0)
    val abs = math.abs(v)

    var p = 1
    var sci: String = null
    while (sci == null && p <= 17) {
      val cand = String.format("%." + (p - 1) + "e", java.lang.Double.valueOf(abs))
      if (cand.toDouble == abs) sci = cand else p += 1
    }
    if (sci == null) sci = String.format("%.16e", java.lang.Double.valueOf(abs))

    // sci looks like "d.dddde+XX" or "de+XX"
    val eIdx = sci.indexOf('e')
    val mant = sci.substring(0, eIdx).filter(_ != '.')
    val exp = sci.substring(eIdx + 1).toInt
    // strip trailing zeros of the shortest representation's mantissa
    val digits0 = mant.reverse.dropWhile(_ == '0').reverse
    val digits = if (digits0.isEmpty) "0" else digits0

    val s =
      if (exp >= digits.length - 1) {
        // integral: pad with zeros
        digits + "0" * (exp - (digits.length - 1))
      } else if (exp >= 0) {
        val intPart = digits.substring(0, exp + 1)
        val fracPart = digits.substring(exp + 1)
        if (fracPart.isEmpty) intPart else s"$intPart.$fracPart"
      } else {
        "0." + ("0" * (-exp - 1)) + digits
      }
    if (neg) s"-$s" else s
  }
}
