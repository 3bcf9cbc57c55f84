package graft.excel

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.excel.HeaderNames

class HeaderNamesSpec extends AnyFunSuite {

  test("blank and missing headers become Field_{i}") {
    assert(HeaderNames.build(Seq(Some("a"), None, Some(""), Some("b"))) ==
      Seq("a", "Field_1", "Field_2", "b"))
  }

  test("duplicates suffixed _2, _3; first keeps bare name") {
    assert(HeaderNames.build(Seq(Some("x"), Some("x"), Some("x"), Some("y"), Some("y"))) ==
      Seq("x", "x_2", "x_3", "y", "y_2"))
  }

  test("reference quirk: generated suffix can collide with literal column") {
    // /root/reference/src/lib.rs:455-463 — dedup doesn't look ahead
    assert(HeaderNames.build(Seq(Some("a"), Some("a"), Some("a_2"))) ==
      Seq("a", "a_2", "a_2_2"))
  }

  test("fixture headers.xlsx shape: a,,a,b,a_2") {
    assert(HeaderNames.build(Seq(Some("a"), None, Some("a"), Some("b"), Some("a_2"))) ==
      Seq("a", "Field_1", "a_2", "b", "a_2_2"))
  }

  test("property: arity preserved for random inputs") {
    val rnd = new scala.util.Random(13)
    val pool = Seq(Some("a"), Some("b"), Some("c"), Some(""), Some("Field_0"), None)
    (1 to 500).foreach { _ =>
      val raw = Seq.fill(rnd.nextInt(20))(pool(rnd.nextInt(pool.length)))
      assert(HeaderNames.build(raw).length == raw.length)
    }
  }

  // ---- headerDedup=reference: byte-for-byte replication of the
  // reference's per-name counter (/root/reference/src/lib.rs:455-463);
  // when the collision quirk would produce DUPLICATE names — which
  // Spark cannot materialize — it must refuse loudly at schema time

  test("reference mode: a,a,a_2 (the quirk) refuses with the duplicate named") {
    val e = intercept[IllegalArgumentException] {
      HeaderNames.build(Seq(Some("a"), Some("a"), Some("a_2")), mode = "reference")
    }
    assert(e.getMessage.contains("a_2"))
    assert(e.getMessage.contains("headerDedup=unique"))
  }

  test("reference mode: per-original-name counters, Field fill first") {
    assert(HeaderNames.build(
      Seq(Some("x"), Some("x"), Some("x")), mode = "reference") ==
      Seq("x", "x_2", "x_3"))
    // a later literal a_2 keeps its own counter (no look-ahead): the
    // output would be a, Field_1, a_2, b, a_2 — duplicate → refusal
    intercept[IllegalArgumentException] {
      HeaderNames.build(
        Seq(Some("a"), None, Some("a"), Some("b"), Some("a_2")),
        mode = "reference")
    }
  }

  test("both modes agree whenever no generated suffix collides") {
    val rnd = new scala.util.Random(29)
    val pool = Seq(Some("a"), Some("b"), Some("c"), Some(""), None)
    (1 to 500).foreach { _ =>
      val raw = Seq.fill(rnd.nextInt(16))(pool(rnd.nextInt(pool.length)))
      // pool has no literal "_k"-suffixed names, so the quirk can't fire
      assert(HeaderNames.build(raw) == HeaderNames.build(raw, "reference"))
    }
  }

  test("unknown mode is rejected loudly") {
    intercept[IllegalArgumentException] {
      HeaderNames.build(Seq(Some("a")), mode = "fuzzy")
    }
  }
}
