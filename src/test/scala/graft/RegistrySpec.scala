package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: SparkEntry.queries is a name-keyed Map, so a
  * duplicate QueryDef name would SILENTLY drop a query from the driver's
  * correctness sweep — the worst kind of coverage loss. Also pins that
  * every declared query carries an oracle (the driver records a weaker
  * rows-only check otherwise) and that bench queries stay inside the
  * registry.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique — nothing shadowed out of the sweep") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == names.length)
  }

  test("every declared query has a DuckDB oracle") {
    val missing = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: ${missing.mkString(", ")}")
  }

  test("bench set is non-empty and drawn from the registry") {
    assert(SparkEntry.benchQueries.nonEmpty)
    val names = SparkEntry.registry.map(_.name).toSet
    SparkEntry.benchQueries.foreach(q => assert(names.contains(q.name)))
  }

  test("names follow the qNN_ naming convention the driver sorts by") {
    val bad = SparkEntry.registry.map(_.name)
      .filterNot(_.matches("q\\d{2}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"nonconforming names: ${bad.mkString(", ")}")
  }
}
