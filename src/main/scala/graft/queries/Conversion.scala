package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.excel.{XlsbWriter, XlsxWriter}
import graft.sources.excel.XlsxWriter._

/** Excel-conversion queries: exercise the DSv2 excel source end-to-end
  * inside the driver's oracle gate. The fixture content is deterministic,
  * so the oracle is a literal VALUES table.
  */
object Conversion {

  /** Deterministic fixture covering the type-variant surface. */
  private def fixturePath(): String =
    graft.RunPaths.sharedFixture("graft_q02_fixture.xlsx") { out =>
      XlsxWriter.write(out, Seq(Sheet.dense("data",
        Seq(Some(XShared("id")), Some(XShared("name")), Some(XShared("amount")), Some(XShared("flag"))) +:
        Seq(
          Seq(Some(XNum(1)), Some(XStr("alpha")), Some(XNum(1.5)), Some(XBool(true))),
          Seq(Some(XNum(2)), Some(XShared("beta")), Some(XNum(2.0)), Some(XBool(false))),
          Seq(Some(XNum(3)), Some(XStr("gamma")), None, Some(XEmpty)),
          Seq(Some(XNum(4)), Some(XErr("#DIV/0!")), Some(XNum(-0.25)), None)))))
    }

  /** The same logical fixture in BIFF12 binary form (xlsb decoder R2). */
  private def xlsbFixturePath(): String =
    graft.RunPaths.sharedFixture("graft_q02_fixture.xlsb") { out =>
      XlsbWriter.write(out, Seq(Sheet.dense("data",
        Seq(Some(XShared("id")), Some(XShared("name")), Some(XShared("amount")), Some(XShared("flag"))) +:
        Seq(
          Seq(Some(XNum(1)), Some(XStr("alpha")), Some(XNum(1.5)), Some(XBool(true))),
          Seq(Some(XNum(2)), Some(XShared("beta")), Some(XNum(2.0)), Some(XBool(false))),
          Seq(Some(XNum(3)), Some(XStr("gamma")), None, Some(XEmpty)),
          Seq(Some(XNum(4)), Some(XErr("#DIV/0!")), Some(XNum(-0.25)), None)))))
    }

  /** Pre-generate the 200k-row bench workbook (also called by Bench.main
    * outside the timed section so the first measured run is conversion
    * only, not fixture generation).
    */
  def ensureBenchFixture(): String =
    graft.RunPaths.sharedFixture("graft_bench_200k.xlsx") { out =>
      val rows = (1 to 200000).map { i =>
        Seq(Some(XNum(i)), Some(XStr(s"name_$i")), Some(XNum(i * 1.5)),
          Some(XShared(s"cat${i % 50}")), Some(XBool(i % 2 == 0)),
          Some(XNum(i % 1000)), Some(XStr(s"note for row $i")),
          if (i % 10 == 0) None else Some(XNum(i * 0.25)))
      }
      XlsxWriter.write(out, Seq(Sheet.dense("data",
        Seq("id", "name", "amount", "cat", "flag", "bucket", "note", "opt")
          .map(h => Option(XShared(h): XCell)) +: rows)))
    }

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q02_xlsb_roundtrip",
      (s, _) => {
        val path = xlsbFixturePath()
        s.read.format("excel").load(path)
          .orderBy(col("id").cast("int"))
      },
      Some("""SELECT * FROM (VALUES
             |  ('1', 'alpha', '1.5',   'true'),
             |  ('2', 'beta',  '2',     'false'),
             |  ('3', 'gamma', NULL,    ''),
             |  ('4', 'Div0',  '-0.25', NULL)
             |) AS t(id, name, amount, flag)
             |ORDER BY CAST(id AS INTEGER)""".stripMargin)),

    QueryDef(
      "q02_excel_roundtrip",
      (s, _) => {
        val path = fixturePath()
        s.read.format("excel").load(path)
          .orderBy(col("id").cast("int"))
      },
      Some("""SELECT * FROM (VALUES
             |  ('1', 'alpha', '1.5',   'true'),
             |  ('2', 'beta',  '2',     'false'),
             |  ('3', 'gamma', NULL,    ''),
             |  ('4', 'Div0',  '-0.25', NULL)
             |) AS t(id, name, amount, flag)
             |ORDER BY CAST(id AS INTEGER)""".stripMargin)),

    // Multi-file scan: a directory of workbooks plans one partition per
    // file (the file-parallel unit for bulk conversion); global row order
    // is lexicographic by file then in-file order.
    QueryDef(
      "q02_excel_dir_scan",
      (s, _) => {
        val d = graft.RunPaths.sharedFixture("graft_q02_dir") { out =>
          val dir = Paths.get(out)
          Files.createDirectories(dir)
          def sheet(rows: Seq[Seq[Option[XCell]]]) =
            Seq(Sheet.dense("data",
              Seq(Some(XShared("id")), Some(XShared("v"))) +: rows))
          XlsxWriter.write(dir.resolve("part_b.xlsx").toString, sheet(
            Seq(Seq(Some(XNum(3)), Some(XStr("three"))),
              Seq(Some(XNum(4)), Some(XStr("four"))))))
          XlsxWriter.write(dir.resolve("part_a.xlsx").toString, sheet(
            Seq(Seq(Some(XNum(1)), Some(XStr("one"))),
              Seq(Some(XNum(2)), Some(XStr("two"))))))
        }
        s.read.format("excel").load(d).orderBy(col("id").cast("int"))
      },
      Some("""SELECT * FROM (VALUES
             |  ('1', 'one'), ('2', 'two'), ('3', 'three'), ('4', 'four')
             |) AS t(id, v) ORDER BY CAST(id AS INTEGER)""".stripMargin)),

    // Conversion throughput benchmark: a 200k-row x 8-col xlsx (generated
    // once, cached) through the full scan->parquet pipeline. No oracle
    // (rows-only); the value is the BENCH timing against the reference's
    // single-node converter profile.
    QueryDef(
      "q02_convert_throughput",
      (s, _) => {
        // writePartitions stays 1 here: at 200k rows the serial encode is
        // pipelined with the scan inside one task, and measured faster
        // (1.5 s) than the parallel-encode path (2.5 s), whose
        // persist+range-shuffle only amortizes on multi-GB workbooks.
        val src = ensureBenchFixture()
        val out = graft.RunPaths.scratch("graft_bench_200k.parquet")
        graft.ExcelToParquet.convert(s, graft.ExcelToParquet.Options(src, out))
        s.read.parquet(out).agg(count(lit(1)).as("n_rows"))
      },
      // The bench fixture is deterministic (200k data rows), so the
      // end-to-end conversion row count is oracle-checkable.
      Some("SELECT CAST(200000 AS BIGINT) AS n_rows"),
      bench = true),

    // Splittable single-sheet conversion (the 100 TB story for R1/R9):
    // the SAME 200k-row workbook as q02_convert_throughput, but scanned
    // as 8 byte-range partitions of the inflated sheet XML
    // (sheetPartitions=8 — one task per range, the unit of parallelism
    // when the corpus is one huge workbook rather than many files). The
    // timed work is the full convert plus an ORDER-PARITY contract,
    // proven distributively (no collect, no window): per part-file
    // (min, max, count) must tile [1, 200000] contiguously — mx-mn+1 =
    // cnt within each file, global count exact — and file-name order
    // (= scan partition ordinal) must equal row order — each file's mn
    // is 1 + the total count of all lexicographically-earlier files (an
    // 8-row broadcast self-join on the checkpointed per-file stats).
    // The fixture's id column is 1..200000 in sheet order, so these
    // together are EQUIVALENT to "the split conversion reproduces the
    // single-partition global row order".
    QueryDef(
      "q02_convert_split",
      (s, _) => {
        val src = ensureBenchFixture()
        val out = graft.RunPaths.scratch("graft_bench_200k_split.parquet")
        graft.ExcelToParquet.convert(s,
          graft.ExcelToParquet.Options(src, out, sheetPartitions = 8))
        // Parity is proven on the conversion OUTPUT, not a second xlsx
        // scan: each scan partition writes its own part file, the writer
        // preserves within-partition order, and part-file names carry
        // the partition ordinal (part-0000i) — so per-FILE stats tiling
        // [1, 200000] in file-name order is the whole-pipeline order
        // contract, at the price of one parquet re-read instead of a
        // duplicate two-pass workbook parse.
        val parts = s.read.parquet(out)
          .select(col("id").cast("long").as("id"),
            input_file_name().as("f"))
          .groupBy("f")
          .agg(min("id").as("mn"), max("id").as("mx"),
            count(lit(1)).as("cnt"))
          .localCheckpoint(true) // 8 rows
        val ordered = parts.join(
            parts.select(col("f").as("bf"), col("cnt").as("bcnt")),
            col("bf") < col("f"), "left")
          .groupBy(col("f"), col("mn"), col("mx"), col("cnt"))
          .agg(coalesce(sum(col("bcnt")), lit(0L)).as("before"))
        ordered.agg(
          sum(col("cnt")).as("n_rows"),
          (countDistinct(col("f")) === 8).as("split_ok"),
          (count(when(col("mx") - col("mn") + 1 =!= col("cnt"), 1)) === 0)
            .as("contiguous_ok"),
          (count(when(col("mn") =!= col("before") + 1, 1)) === 0)
            .as("ordered_ok"))
      },
      Some("""SELECT CAST(200000 AS BIGINT) AS n_rows, true AS split_ok,
             |       true AS contiguous_ok, true AS ordered_ok""".stripMargin),
      bench = true),

    // Conversion through the parquet sink and back (R1+R10 end-to-end):
    // convert the fixture to zstd parquet, then aggregate over the result.
    QueryDef(
      "q02_excel_to_parquet",
      (s, _) => {
        val out = graft.RunPaths.scratch("graft_q02_out.parquet")
        graft.ExcelToParquet.convert(s,
          graft.ExcelToParquet.Options(fixturePath(), out))
        s.read.parquet(out)
          .agg(count(lit(1)).as("n_rows"),
            count(col("amount")).as("n_amount_present"),
            sum(col("id").cast("long")).as("id_sum"))
      },
      Some("""SELECT count(*) AS n_rows, count(amount) AS n_amount_present,
             |       CAST(sum(CAST(id AS BIGINT)) AS BIGINT) AS id_sum
             |FROM (VALUES
             |  ('1', 'alpha', '1.5',   'true'),
             |  ('2', 'beta',  '2',     'false'),
             |  ('3', 'gamma', NULL,    ''),
             |  ('4', 'Div0',  '-0.25', NULL)
             |) AS t(id, name, amount, flag)""".stripMargin))
  )
}
