package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed batch-perceptron training — the quality-classifier-in-
  * the-loop TRAINING half (q45's kNN / centroid / DSIR queries only
  * evaluate or apply a model; this trains one on the cluster).
  *
  * The model is a linear classifier over hashed bag-of-words count
  * features (the fastText-style quality-filter shape: CCNet, GPT-3 and
  * FineWeb all gate documents on a cheap linear scorer). Training is
  * the BATCH perceptron: per epoch, every document misclassified under
  * the current weights contributes `y·x` to one summed update. Unlike
  * SGD (inherently sequential) or logistic regression (float exp), the
  * batch-perceptron step is a plain commutative integer sum — so the
  * trained weights are BIT-IDENTICAL on any partitioning, any executor
  * count, any shuffle order, and an SQL engine can replay the whole
  * training run exactly (the q61 oracle unrolls the epochs as CTEs).
  *
  * Scale shape: the corpus is featurized ONCE into `(doc_id, y,
  * bucket, x)` rows (one map-side-combined shuffle) and persisted;
  * every epoch is then two keyed shuffles over that table — a per-doc
  * margin aggregate and a per-bucket update aggregate — of which the
  * driver collects exactly `buckets + 1` longs (the new weight
  * vector). Per-epoch driver traffic is O(weights), executor work is
  * linear in corpus tokens, epochs are a fixed constant. The bias is
  * weight[-1] on a constant feature, so it rides the same aggregates.
  */
object Perceptron {

  /** Bias rides as bucket -1 with x = 1 on every doc. */
  val BiasBucket: Long = -1L

  final case class TrainResult(
      weights: Map[Long, Long], // bucket (incl. BiasBucket) -> weight
      mistakes: Seq[Long],      // per-epoch misclassified count (under w_{t-1})
      finalErrors: Long)        // misclassified count under the final weights

  /** Appends the per-doc bias row (bucket -1, x = 1) to a raw hashed
    * feature table `(doc_id, y, bucket, x)`.
    */
  def withBias(feat0: DataFrame): DataFrame =
    feat0.unionByName(
      feat0.select(col("doc_id"), col("y")).distinct()
        .select(col("doc_id"), col("y"),
          lit(BiasBucket).as("bucket"), lit(1L).as("x")))

  /** Per-doc integer margin `m = w·x` under fixed weights — the SERVE
    * side: one map-side-combined aggregate keyed by doc, the weights a
    * literal map baked into the plan (a model of buckets+1 longs is
    * plan metadata, not a join). Input must already carry bias rows.
    * Returns `(doc_id, y, m)`.
    */
  def margins(feat: DataFrame, w: Map[Long, Long]): DataFrame = {
    val entries = w.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    feat.groupBy(col("doc_id"), col("y"))
      .agg(sum(element_at(map(entries: _*), col("bucket")) * col("x"))
        .as("m"))
  }

  /** Per-ROW integer margin `w·x` computed inside ONE expression over
    * the raw text — the zero-shuffle serving path: no explode, no
    * per-doc aggregate. Backed by the native codegen'd
    * [[graft.functions.PerceptronMarginF]] kernel (the declarative HOF
    * fold is CodegenFallback — see [[marginExprHof]], kept as the
    * spec's reference formulation). Same integer result as [[margins]]
    * (addition is commutative), proven equal in PerceptronSpec. This
    * is the form that gates a 100 TB scan — or an ingestion stream
    * (q20_stream_quality) — map-only. The tokenize/hash must stay in
    * lockstep with `Classifier.perceptronFeatures`.
    */
  def marginExpr(textCol: Column, w: Map[Long, Long]): Column =
    graft.functions.PerceptronMarginF(textCol, w)

  /** The declarative higher-order-function formulation of
    * [[marginExpr]] — `aggregate` evaluates its lambda interpreted
    * (ArrayAggregate is CodegenFallback), so this is NOT the serving
    * path; it exists as the independently-derived reference the
    * kernel is spec'd against (PerceptronSpec pins equality on empty /
    * multi-space / non-ASCII inputs).
    */
  def marginExprHof(textCol: Column, w: Map[Long, Long]): Column = {
    val buckets = w.keys.max + 1 // same bucket count the kernel derives
    val entries = w.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val wmap = map(entries: _*)
    aggregate(
      split(textCol, " "),
      lit(w(BiasBucket)),
      (acc, word) => acc + element_at(wmap,
        conv(substring(md5(word), 1, 2), 16, 10).cast("long") % buckets))
  }

  /** `feat` columns: `doc_id: Long`, `y: Long` (+1/-1), `bucket: Long`
    * in `[0, buckets)`, `x: Long` (count feature). A bias row
    * (bucket = -1, x = 1) is appended per doc here — callers pass raw
    * hashed counts. Weights start at zero, learning rate 1, a margin
    * of exactly 0 counts as a mistake (so epoch 1 updates on every
    * doc — pinned in PerceptronSpec and the SQL oracle).
    */
  def train(feat0: DataFrame, buckets: Int, epochs: Int): TrainResult = {
    // ONE shuffle on the doc key, then persist: hash-partitioning on
    // doc_id satisfies both per-epoch distributions (the (doc_id, y)
    // margin aggregate — subset clustering — and the doc_id equi-join
    // back), so every epoch reuses this layout and only the tiny
    // misclassified-id side moves. The 100 TB form of the same
    // decision is a feature table written bucketed by doc key.
    // sortWithinPartitions (r18): the per-epoch margin window needs
    // (hash-partitioned by doc_id, sorted by doc_id) input; persisting
    // the layout ALREADY SORTED means the one sort is paid at
    // materialization and every epoch's window (plus the final-errors
    // pass) reads a pre-sorted InMemoryRelation instead of re-sorting
    // the whole feature table per epoch (guide §5 — layout reuse).
    val feat = withBias(feat0)
      .repartition(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var w: Map[Long, Long] =
      (BiasBucket until buckets.toLong).map(_ -> 0L).toMap
    val mistakes = ArrayBuffer.empty[Long]

    // Per-doc margin carried ON EVERY FEATURE ROW via a window over
    // the doc partition (r17): the persisted layout is already
    // hash-partitioned by doc_id, so the window adds NO exchange —
    // only the within-partition sort — whereas the previous
    // margins-aggregate + doc_id join-back shape ran a separate
    // margin aggregate and a join per epoch (the sort-merge join
    // sorted both sides anyway). Same integers: the window sum is the
    // identical commutative Σ w[bucket]·x per doc.
    def withMargin(): DataFrame = {
      val entries = w.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      val win = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      feat.withColumn("m",
        sum(element_at(map(entries: _*), col("bucket")) * col("x")).over(win))
    }

    (1 to epochs).foreach { _ =>
      // one collect of <= buckets+1 rows: the summed update vector.
      // Every doc carries exactly one bias row (x = 1), so the bias
      // bucket's plain row count IS the misclassified-doc count.
      val upd = withMargin()
        .filter(col("y") * col("m") <= 0)
        .groupBy("bucket")
        .agg(sum(col("y") * col("x")).as("dw"), count(lit(1)).as("n"))
        .collect()
      mistakes += upd.find(_.getLong(0) == BiasBucket).map(_.getLong(2)).getOrElse(0L)
      upd.foreach { r =>
        val b = r.getLong(0)
        w = w.updated(b, w(b) + r.getLong(1))
      }
    }

    // misclassified DOCS under the final weights = misclassified BIAS
    // rows (exactly one per doc), counted map-only on the windowed frame
    val finalErrors = withMargin()
      .filter(col("y") * col("m") <= 0 && col("bucket") === BiasBucket)
      .count()
    feat.unpersist()
    TrainResult(w, mistakes.toSeq, finalErrors)
  }
}
