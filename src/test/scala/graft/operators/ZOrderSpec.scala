package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference Morton code: bit i of a → position 2i+1, of b → 2i. */
  private def morton(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i + 1)
      z |= ((b >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  test("interleave matches the reference Morton code (property)") {
    import spark.implicits._
    val pairs = (for {
      a <- Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L, 123456L)
      b <- Seq(0L, 1L, 42L, 4095L, 65535L, 999999L)
    } yield (a, b))
    val df = pairs.toDF("a", "b")
      .withColumn("z", ZOrder.interleave(col("a"), col("b"), 16))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    df.foreach { case (a, b, z) =>
      assert(z == morton(a & 0xFFFF, b & 0xFFFF, 16),
        s"interleave($a, $b) = $z != ${morton(a & 0xFFFF, b & 0xFFFF, 16)}")
    }
  }

  test("z-clustered files have narrow ranges on BOTH dimensions") {
    import spark.implicits._
    // 64x64 grid, uniformly filled: after z-clustering into 16 files,
    // each file should cover a small fraction of each axis — that range
    // narrowing is exactly what parquet min/max skipping prunes with.
    val n = 64
    val grid = (0 until n * n).map(i => (i % n.toLong, i / n.toLong))
    val out = graft.RunPaths.scratch("zorder_spec.parquet")
    ZOrder.cluster(grid.toDF("x", "y"), col("x"), col("y"),
        numFiles = 16, bits = 8)
      .write.mode("overwrite").parquet(out)
    val spans = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"),
        count(lit(1)).as("cnt"))
      .collect()
    assert(spans.length >= 8, s"expected >=8 files, got ${spans.length}")
    val avgDx = spans.map(_.getAs[Long]("dx")).sum.toDouble / spans.length
    val avgDy = spans.map(_.getAs[Long]("dy")).sum.toDouble / spans.length
    // a lexicographic sort on x would give avg dy ≈ 63 (full span);
    // z-order bounds both average spans well below half the axis
    assert(avgDx <= n / 2.0, s"avg x-span $avgDx not narrowed")
    assert(avgDy <= n / 2.0, s"avg y-span $avgDy not narrowed")
  }

  test("compaction preserves rows and reduces file count") {
    import spark.implicits._
    val in = graft.RunPaths.scratch("compact_in.parquet")
    val out = graft.RunPaths.scratch("compact_out.parquet")
    (1L to 10000L).toDF("k").repartition(32, col("k"))
      .write.mode("overwrite").parquet(in)
    val stats = Compaction.compact(spark, in, out, targetFileBytes = 64L * 1024 * 1024)
    assert(stats.filesBefore == 32)
    assert(stats.filesAfter >= 1 && stats.filesAfter < 32)
    val back = spark.read.parquet(out)
    assert(back.count() == 10000)
    assert(back.agg(sum("k")).head.getLong(0) == 10000L * 10001 / 2)
  }
}
