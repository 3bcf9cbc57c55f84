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
    // 2 digits through q99; the family crossed into 3 at
    // q100_batch_serve (r15) — the driver keys by exact name, so the
    // width change is cosmetic ordering only
    val bad = SparkEntry.registry.map(_.name)
      .filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"nonconforming names: ${bad.mkString(", ")}")
  }

  test("every oracle SQL parses and binds in DuckDB (EXPLAIN, no execute)") {
    // A malformed oracle previously failed only at driver time — after
    // the round's Spark work was done, silently weakening the sweep.
    // Gate it here: one python/duckdb subprocess EXPLAINs every oracle
    // against views over the sf0.001 tables. Skipped (not failed) where
    // the driver-side python/duckdb toolchain isn't installed.
    // pick the first python3 that can import duckdb (the driver-side
    // toolchain may live behind a pyenv shim rather than /usr/bin)
    val candidates =
      sys.env.get("PATH").toSeq.flatMap(_.split(':'))
        .map(d => java.nio.file.Paths.get(d, "python3"))
        .filter(java.nio.file.Files.isExecutable(_)).map(_.toString) ++
        Seq("/usr/bin/python3", "/usr/local/bin/python3")
          .filter(p => java.nio.file.Files.isExecutable(java.nio.file.Paths.get(p)))
    val python = candidates.distinct.find { p =>
      try new ProcessBuilder(p, "-c", "import duckdb").start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    }
    assume(python.isDefined, "no python3 with duckdb available")
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/root/testdata/sf0.001")), "testdata missing")

    // JSON-escape exactly like graft.Verify's dump (same shared escaper)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonText.quote(k)}: ${JsonText.quote(v)}" }
      .mkString("{", ",", "}")
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(tmp, json)

    val script =
      """import json, sys, duckdb
        |con = duckdb.connect()
        |sf = "/root/testdata/sf0.001"
        |for t in ["region","nation","customer","supplier","part","orders",
        |          "lineitem","events","documents","embeddings"]:
        |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        |bad = []
        |for name, sql in sorted(json.load(open(sys.argv[1])).items()):
        |    try:
        |        con.execute("EXPLAIN " + sql)
        |    except Exception as e:
        |        bad.append(f"{name}: {type(e).__name__}: {e}")
        |for b in bad:
        |    print(b)
        |sys.exit(1 if bad else 0)
        |""".stripMargin
    val pb = new ProcessBuilder(python.get, "-c", script, tmp.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    assert(rc == 0, s"oracle SQL failed DuckDB EXPLAIN:\n$out")
  }
}
