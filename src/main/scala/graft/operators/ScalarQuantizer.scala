package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the second classic embedding-compression
  * tier beside [[ProductQuantizer]] (FAISS's ScalarQuantizer/QT_8bit):
  * each DIMENSION is quantized independently to a byte against the
  * corpus's per-dimension [min, max] range, so a d-dim float vector
  * stores as d bytes — 4× compression against 4-byte floats (vs PQ's
  * 8× at house geometry) for a far higher fidelity ceiling, since the
  * per-dimension error is bounded by span/512 instead of a codebook's
  * cell radius.
  *
  * What makes SQ8 special in THIS engine: the model is per-dimension
  * min/max — ORDER-INDEPENDENT aggregates, so unlike every k-means
  * artifact the trained model is bit-stable across executions AND
  * engines, codes are closed-form integers, and dequantized values are
  * deterministic doubles. The whole train→encode→serve pipeline
  * therefore carries a VALUE-exact DuckDB oracle (q104_ann_sq8) — the
  * only float-vector ANN entry that can.
  *
  * Serving reuses the PQ machinery unchanged: codes are GLOBAL ids
  * (dim·256 + byte), a query precomputes the flat 256·d lookup table
  * lut(dim·256 + c) = (q_dim − dq(dim, c))² on the driver (a
  * model-scale object, exactly like any ADC LUT), and scoring is
  * [[graft.functions.LutSumF]] — a codegen'd map over the codes scan
  * with NO join and NO shuffle; the only exchange in a top-k plan is
  * TakeOrderedAndProject. At 100 TB this is the brute-force-fidelity
  * tier: a full scan of 4×-compressed codes; the IVF coarse cells
  * compose on top exactly as they do over PQ codes when probe pruning
  * is wanted.
  */
object ScalarQuantizer {

  /** Per-dimension [lo, hi] over the corpus: one narrow aggregation
    * (posexplode → groupBy dim), collected as the model (d pairs of
    * doubles — driver-scale like any trained model). min/max over
    * floats is associative and commutative, so the result is
    * bit-stable at any partitioning.
    */
  def train(data: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = data
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))
      .collect()
    require(rows.nonEmpty, "ScalarQuantizer.train: empty corpus")
    val d = rows.map(_.getInt(0)).max + 1
    val lo = new Array[Double](d)
    val hi = new Array[Double](d)
    rows.foreach { r => lo(r.getInt(0)) = r.getDouble(1); hi(r.getInt(0)) = r.getDouble(2) }
    (lo, hi)
  }

  /** Encode vectors as (idCol, codes: array<bigint>) with GLOBAL code
    * ids dim·256 + byte, where byte = clamp₀²⁵⁵⌊(x − lo)·256/span⌋ (0
    * for a zero-span dimension). The arithmetic is the exact IEEE
    * order the q104 oracle replicates in SQL — closed-form, no floats
    * trained anywhere. The per-element lambda evaluates interpreted
    * (HOF), which is fine for the OFFLINE encode path; serving never
    * touches it.
    */
  def encode(
      data: DataFrame, idCol: String, vecCol: String,
      lo: Array[Double], hi: Array[Double]): DataFrame = {
    val loL = typedLit(lo.toSeq)
    val hiL = typedLit(hi.toSeq)
    data.select(col(idCol),
      transform(col(vecCol), (x, i) => {
        val l = element_at(loL, i + 1)
        val h = element_at(hiL, i + 1)
        val c = when(h === l, lit(0)).otherwise(
          least(lit(255), greatest(lit(0),
            floor((x.cast("double") - l) * lit(256.0) / (h - l)).cast("int"))))
        c.cast("bigint") + i.cast("bigint") * lit(256L)
      }).as("codes"))
  }

  /** Midpoint dequantization of byte `c` in dimension `dim` — the
    * reconstruction the LUT and the oracle share: lo + (c+0.5)·span/256
    * (a zero-span dimension reduces to lo with no special case).
    */
  def dequant(lo: Double, hi: Double, c: Int): Double =
    lo + (c + 0.5) * (hi - lo) / 256.0

  /** Flat 256·d LUT for one query: lut(dim·256 + c) = (q_dim − dq)².
    * Driver-built per query like any ADC table; [[graft.functions.LutSumF]]
    * over [[encode]]'s global codes then yields Σ_dim (q − dq)² — the
    * asymmetric squared-L2 distance to the quantized vector.
    */
  def lutFor(q: Array[Double], lo: Array[Double], hi: Array[Double]): Array[Double] = {
    require(q.length == lo.length && lo.length == hi.length,
      s"ScalarQuantizer.lutFor: dim mismatch q=${q.length} model=${lo.length}")
    val lut = new Array[Double](q.length * 256)
    var i = 0
    while (i < q.length) {
      var c = 0
      while (c < 256) {
        val diff = q(i) - dequant(lo(i), hi(i), c)
        lut(i * 256 + c) = diff * diff
        c += 1
      }
      i += 1
    }
    lut
  }
}
