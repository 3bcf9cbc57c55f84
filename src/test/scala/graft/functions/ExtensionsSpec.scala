package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions installer must make every graft_* function
  * resolvable from SQL in a fresh session, with results identical to the
  * Column API; MergeUpsert must implement latest-wins keyed merge.
  */
class ExtensionsSpec extends AnyFunSuite {

  // Extensions only apply when a session is CREATED, and the
  // `spark.sql.extensions` static conf is read off the SparkContext — which
  // a sibling spec already created without it. Force a fresh session and
  // install programmatically (the same GraftExtensions class the config
  // string names; the config path needs a session that owns its context).
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.GraftExtensions()(_))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("extension-injected SQL functions match the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq("the quick brown fox jumps", "pack my box with five dozen")
      .toDF("text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql("""
      SELECT graft_rolling_hash64(text) AS fp,
             graft_simhash64(split(text, ' ')) AS sh,
             size(graft_word_shingles(text, 3)) AS n3,
             size(graft_minhash_signature(graft_word_shingles(text, 3), 16)) AS k,
             size(graft_minhash_band_keys(graft_word_shingles(text, 3), 4, 4)) AS b
      FROM ext_docs""").collect()
    val viaApi = docs.select(
      RollingHash64.rolling_hash64(col("text")).as("fp"),
      SimHash64.simhash64(split(col("text"), " ")).as("sh"),
      size(WordShingles.word_shingles(col("text"), 3)).as("n3"),
      size(MinHashSignature.minhash_signature(
        WordShingles.word_shingles(col("text"), 3), 16)).as("k"),
      size(MinHashSignature.minhash_band_keys(
        WordShingles.word_shingles(col("text"), 3), 4, 4)).as("b")).collect()
    assert(viaSql.map(_.toString).toSeq == viaApi.map(_.toString).toSeq)
    assert(viaSql.forall(r => r.getInt(3) == 16 && r.getInt(4) == 4))
  }

  test("graft_perceptron_margin from SQL equals the operator's kernel") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq("alpha beta gamma", "delta", "").toDF("text")
    docs.createOrReplaceTempView("ext_pm")
    // 32 bucket weights + bias, matching the kernel's layout
    val w: Map[Long, Long] = (-1L until 32L).map(b => b -> (b * 5 - 3)).toMap
    val arrSql = (0L until 32L).map(w).mkString(",") + "," + w(-1L)
    val viaSql = spark.sql(
      s"SELECT graft_perceptron_margin(text, array($arrSql)) AS m FROM ext_pm")
      .as[Long].collect().toSeq
    val viaApi = docs.select(
      graft.operators.Perceptron.marginExpr(col("text"), w).as("m"))
      .as[Long].collect().toSeq
    assert(viaSql === viaApi)
    // a per-row (non-literal) weights array must be refused
    val e = intercept[Exception] {
      spark.sql("SELECT graft_perceptron_margin(text, array(length(text))) FROM ext_pm")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
    // NULL weight elements are refused with the descriptive message,
    // not an internal NPE
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_perceptron_margin(text, array(1, CAST(NULL AS BIGINT), 3)) FROM ext_pm")
        .collect()
    }
    assert(e2.getMessage.contains("NULL elements"), e2.getMessage)
    // a foldable NULL weights VALUE has the correct type, so the error
    // must name the null, not mislead with a type complaint
    val e3 = intercept[Exception] {
      spark.sql("SELECT graft_perceptron_margin(text, CAST(NULL AS ARRAY<BIGINT>)) FROM ext_pm")
        .collect()
    }
    assert(e3.getMessage.contains("must not be NULL"), e3.getMessage)
  }

  test("non-literal shingle width is rejected with a clear error") {
    import spark.implicits._
    Seq("a b c d").toDF("text").createOrReplaceTempView("ext_nonlit")
    // length(text) over a column is not foldable -> builder must refuse
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(text, length(text)) FROM ext_nonlit").collect()
    }
    assert(e.getMessage.contains("literal integer"), e.getMessage)
  }

  test("HeavyHitters covers every item above n/(k+1) under any partitioning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // zipf-ish: item i appears ~1000/i times
    val data = (1 to 40).flatMap(i => Seq.fill(1000 / i)(i.toLong))
    val n = data.size
    val k = 8
    val trueHH = data.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > n.toDouble / (k + 1)).keySet
    assert(trueHH.nonEmpty)
    Seq(1, 3, 13).foreach { parts =>
      val sketch = data.toDF("x").repartition(parts)
        .agg(udaf(new HeavyHitters(k), org.apache.spark.sql.Encoders.scalaLong)(col("x")))
        .collect().head.getMap[Long, Long](0)
      assert(trueHH.subsetOf(sketch.keySet.toSet), s"parts=$parts sketch=$sketch")
      assert(sketch.size <= k)
    }
  }

  test("MergeUpsert matches the map-semantics model on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val target = (1 to 30).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(100)))
        .distinctBy(_._1)
      val updates = (1 to 15).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(100) + 1000))
        .distinctBy(_._1)
      val model = (target.toMap ++ updates.toMap).toSet
      val got = graft.operators.MergeUpsert.upsert(
        target.toDF("k", "v"), updates.toDF("k", "v"), Seq("k"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == model)
    }
  }

  test("MergeUpsert is latest-wins by key") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val updates = Seq((2L, "b2", 22.0), (9L, "new", 90.0)).toDF("k", "s", "v")
    val got = graft.operators.MergeUpsert.upsert(target, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (9L, "new", 90.0)))
  }
}
