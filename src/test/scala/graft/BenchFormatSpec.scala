package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench must never convert a failed query into a timing: failures render
  * as a visible {"err": ...} object, are excluded from the total, and are
  * counted. (Round 5: a broken query was reported as a 0.092 s "speedup"
  * because the exception was swallowed.)
  */
class BenchFormatSpec extends AnyFunSuite {

  test("a failed query renders as an err object, not a timing") {
    val out = Bench.formatResults(
      Seq(
        "q_ok" -> Right(1.5),
        "q_broken" -> Left("AnalysisException: DATATYPE_MISMATCH"),
        "q_ok2" -> Right(0.25)),
      "/root/testdata/sf0.1")
    assert(out.contains(""""q_broken":{"err":"AnalysisException: DATATYPE_MISMATCH"}"""))
    assert(out.contains(""""q_ok":1.500"""))
    assert(out.contains(""""value":1.750"""), "total must exclude the failed query")
    assert(out.contains(""""errors":1"""))
  }

  test("error messages are JSON-escaped (quotes, backslashes, control chars)") {
    val out = Bench.formatResults(
      Seq("q" -> Left("bad \"col\"\nback\\slash")), "sf")
    // lossless: the newline survives as \n (shared JsonText escaper, the
    // same semantic Verify's artifacts use) instead of being flattened
    assert(out.contains("""{"err":"bad \"col\"\nback\\slash"}"""))
    // the whole line must still be parseable by any JSON reader: balanced
    // braces, no raw newline
    assert(!out.contains("\n"))
  }

  test("sfDir and query-name keys share the same escaping semantic") {
    val out = Bench.formatResults(
      Seq("q\"uoted" -> Right(1.0)), """/tmp/sf "0.1"\x""")
    assert(out.contains(""""q\"uoted":1.000"""))
    assert(out.contains(""""sf":"/tmp/sf \"0.1\"\\x""""))
  }

  test("all-green results keep the original shape") {
    val out = Bench.formatResults(Seq("a" -> Right(2.0)), "sfX")
    assert(out ===
      """{"metric":"total","value":2.000,"unit":"sec","queries":{"a":2.000},"sf":"sfX","errors":0}""")
  }

  test("solo timings render as a sibling map; queries stays numeric") {
    val out = Bench.formatResults(
      Seq("a" -> Right(2.0), "b" -> Right(1.0)), "sfX",
      solo = Seq("a" -> 1.8, "b" -> 0.9))
    assert(out ===
      """{"metric":"total","value":3.000,"unit":"sec","queries":{"a":2.000,"b":1.000},"sf":"sfX","errors":0,"solo":{"a":1.800,"b":0.900}}""")
  }

  test("timings render at 3 decimals so the one-line JSON stays short (r17 verdict #3)") {
    val out = Bench.formatResults(
      Seq("a" -> Right(2.276025784), "b" -> Right(0.0004)), "sfX",
      solo = Seq("a" -> 1.999999999))
    assert(out.contains(""""a":2.276"""))
    assert(out.contains(""""b":0.000"""))
    assert(out.contains(""""solo":{"a":2.000}"""))
    assert(out.contains(""""value":2.276"""))
  }
}
