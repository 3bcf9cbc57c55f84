package graft.excel

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.excel.RustDouble

class RustDoubleSpec extends AnyFunSuite {

  test("known Rust Display cases") {
    val cases = Seq(
      1.0 -> "1",                       // no trailing .0 (Rust vs Java)
      -1.0 -> "-1",
      1.5 -> "1.5",
      0.1 -> "0.1",
      100.0 -> "100",
      0.0 -> "0",
      1e-7 -> "0.0000001",
      123456789.123 -> "123456789.123",
      2.5e-10 -> "0.00000000025",
      45234.5 -> "45234.5",             // an Excel datetime serial
      1.0 / 3.0 -> "0.3333333333333333",
      4e18 -> "4000000000000000000")
    cases.foreach { case (d, want) =>
      assert(RustDouble.format(d) == want, s"for $d")
    }
  }

  test("1e300 prints in full positional notation") {
    val s = RustDouble.format(1e300)
    assert(!s.contains("e") && !s.contains("E"))
    assert(s.length == 301)
    assert(s.startsWith("1"))
  }

  test("specials") {
    assert(RustDouble.format(Double.NaN) == "NaN")
    assert(RustDouble.format(Double.PositiveInfinity) == "inf")
    assert(RustDouble.format(Double.NegativeInfinity) == "-inf")
    assert(RustDouble.format(-0.0) == "-0")
  }

  test("property: output round-trips to the same double, never scientific") {
    val rnd = new scala.util.Random(42)
    val samples =
      Seq.fill(3000)(rnd.nextDouble() * 2e6 - 1e6) ++
      Seq.fill(3000)(rnd.nextDouble() * 2e15 - 1e15) ++
      Seq.fill(3000)(rnd.nextDouble() * 2 - 1) ++
      Seq.fill(3000)(java.lang.Double.longBitsToDouble(rnd.nextLong()))
        .filterNot(d => d.isNaN || d.isInfinite)
    samples.foreach { d =>
      val s = RustDouble.format(d)
      assert(s.toDouble == d, s"$d -> $s")
      assert(!s.contains("e") && !s.contains("E"), s"$d -> $s")
    }
  }

  test("property: integral doubles have no fractional part in output") {
    val rnd = new scala.util.Random(7)
    Seq.fill(2000)(rnd.nextInt().toDouble).foreach { d =>
      assert(!RustDouble.format(d).contains('.'), s"for $d")
    }
  }
}
