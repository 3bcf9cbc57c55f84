package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IndexDrift, ProductQuantizer}
import graft.queries.LlmOps

/** The retrain ACTION (LlmOps.annMaybeRetrain, q81): the decide-and-act
  * mechanics must be exact on both branches — quiet on clean appends
  * (no retrain, serving state identical to the plain frozen-append
  * path), fired on drifted appends (new generation trained on the
  * merged corpus and covering it exactly). Recall recovery itself is
  * q81's sf0.01 oracle contract (and RecallRehearsal's measured table);
  * this spec pins the routing.
  */
class AnnRetrainSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def buildFrozen(base: DataFrame, mDir: String): Unit = {
    LlmOps.buildFrozenIndex(spark, sf, base, mDir,
      "AnnRetrainSpec frozen coarse-centroid table")
    ()
  }

  test("clean append keeps the frozen generation; drifted append " +
      "retrains onto a new one covering the merged corpus") {
    val e = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val clean = e.filter(pmod(col("vec_id"), lit(10)) === 9)
    val drifted = IndexDrift.shifted(clean, "vec_id", "embedding")
    val idx = graft.RunPaths.scratch("graft_annretrain_spec")
    val mDir = s"$idx/model"
    buildFrozen(base, mDir)
    val nBase = base.count()
    val nBatch = clean.count()

    val (cC, _, cCodes, cRetrained) =
      LlmOps.annMaybeRetrain(spark, sf, mDir, s"$idx/clean", base, clean)
    assert(!cRetrained, "clean append must NOT trigger a retrain")
    // the quiet branch's serving state IS the frozen models + stored
    // generations: codes cover base + batch with the frozen cell
    // assignments, and the coarse table is the persisted frozen one
    assert(cCodes.count() == nBase + nBatch)
    val frozenCells = spark.read.parquet(s"$mDir/codes/gen=0")
      .unionByName(spark.read.parquet(s"$idx/clean/codes/gen=1"))
      .select(col("vec_id"), col("cell_id").as("fc"))
    val mismatch = cCodes.select(col("vec_id"), col("cell_id"))
      .join(frozenCells, Seq("vec_id"), "full")
      .filter(col("cell_id").isNull || col("fc").isNull ||
        col("cell_id") =!= col("fc"))
      .count()
    assert(mismatch == 0,
      "quiet-branch serving state must equal the plain frozen-append state")
    val frozenCoarse = spark.read.parquet(s"$mDir/coarse")
      .select(col("cell_id")).collect().map(_.getLong(0)).toSet
    val servedCoarse =
      cC.select(col("cell_id")).collect().map(_.getLong(0)).toSet
    assert(servedCoarse == frozenCoarse)

    val (_, _, dCodes, dRetrained) =
      LlmOps.annMaybeRetrain(spark, sf, mDir, s"$idx/drift", base, drifted)
    assert(dRetrained, "drifted append must trigger the retrain")
    assert(dCodes.count() == nBase + nBatch,
      "retrained generation must cover the merged corpus exactly")
    // the retrained generation is self-contained: every id exactly once
    assert(dCodes.select(col("vec_id")).distinct().count() == nBase + nBatch)

    // the loop must ITERATE: the retrained directory satisfies the
    // function's own precondition (coarse, books, codes/gen=0,
    // base_occ), so pointing modelIdx at it and appending the next
    // batch works — quiet on an in-distribution batch drawn from the
    // merged (drift-inclusive) corpus
    val retrainedIdx = s"$idx/drift/retrain"
    for (part <- Seq("coarse", "books", "codes/gen=0", "base_occ"))
      assert(new java.io.File(s"$retrainedIdx/$part").exists(),
        s"retrained index must persist $part — the next append's " +
          "trigger reads it")
    val merged = base.unionByName(drifted)
    val next = merged.sample(withReplacement = false, 0.2, seed = 7)
    val (_, _, nCodes, nRetrained) = LlmOps.annMaybeRetrain(
      spark, sf, retrainedIdx, s"$idx/next", merged, next)
    assert(!nRetrained,
      "an in-distribution batch against the retrained index must append " +
        "quietly — the drift loop iterates")
    assert(nCodes.count() == merged.count() + next.count())
  }
}
