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
  * Implementation (hot path of the Excel scan — ~1 call per numeric
  * cell): integral doubles short-circuit to Long.toString; everything
  * else probes precisions 1..17 by rounding the EXACT binary value
  * (`new BigDecimal(double)`) to p significant digits and taking the
  * first that parses back equal. BigDecimal rounding is correctly
  * rounded, so the first hit is the shortest representation — same
  * result as %.*e probing at ~5x less cost (String.format dominated the
  * original conversion profile).
  */
object RustDouble {

  private val contexts: Array[java.math.MathContext] =
    (0 to 17).map(p => new java.math.MathContext(math.max(p, 1),
      java.math.RoundingMode.HALF_EVEN)).toArray

  def format(v: Double): String = {
    if (java.lang.Double.isNaN(v)) return "NaN"
    if (v == Double.PositiveInfinity) return "inf"
    if (v == Double.NegativeInfinity) return "-inf"
    if (v == 0.0d) return if (1.0d / v < 0) "-0" else "0"

    // fast path: integral values inside the exact-long range print without
    // any fractional part (Rust prints them without ".0")
    if (v == math.rint(v) && math.abs(v) <= 9.007199254740992e15)
      return v.toLong.toString

    val neg = v < 0
    val abs = math.abs(v)
    val exact = new java.math.BigDecimal(abs)
    var p = 1
    var best: java.math.BigDecimal = null
    while (best == null && p <= 17) {
      val cand = exact.round(contexts(p))
      if (cand.doubleValue() == abs) best = cand else p += 1
    }
    if (best == null) best = exact.round(contexts(17))
    val s = best.stripTrailingZeros.toPlainString
    if (neg) s"-$s" else s
  }
}
