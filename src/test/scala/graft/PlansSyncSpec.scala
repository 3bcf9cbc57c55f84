package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md must cover the CURRENT bench set (r13 finding: the plan
  * dump drifted one entry behind when q89_adopt_trigger joined the
  * set). This guard folds the regeneration into the round loop
  * structurally: adding a bench entry without re-running
  * `graft.tools.PlanDump` fails the suite, so the dump and the set
  * cannot drift silently again.
  */
class PlansSyncSpec extends AnyFunSuite {

  test("PLANS.md has a plan section for every bench-set query") {
    val path = Paths.get("PLANS.md")
    assert(Files.exists(path), "PLANS.md missing — run graft.tools.PlanDump")
    val plans = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    // line-anchored with trailing newline: a bare substring check
    // would let a bench name that is a proper PREFIX of an existing
    // section name pass without its own section
    val missing = SparkEntry.benchQueries.map(_.name)
      .filterNot(n => plans.contains(s"## $n\n"))
    assert(missing.isEmpty,
      s"PLANS.md is stale — regenerate with " +
        s"`sbt \"runMain graft.tools.PlanDump\"`; missing: " +
        missing.mkString(", "))
  }
}
