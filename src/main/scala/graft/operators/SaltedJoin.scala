package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join by key salting: the skewed (large) side gets
  * a deterministic per-row salt in [0, salts); the small side is
  * replicated once per salt value; the join key becomes (key, salt), so a
  * hot key's rows spread across `salts` shuffle partitions instead of
  * hammering one reducer.
  *
  * AQE's skew-join split (enabled in GraftSession) handles most skew
  * adaptively at runtime; explicit salting remains the tool for extreme
  * single-key skew (the classic "null key" or "power-law id" case) and
  * for engines/paths where AQE can't help (e.g. aggregations keyed by the
  * hot column — salt, partially aggregate, then merge).
  *
  * Result is exactly the plain inner join (salting only re-partitions).
  */
object SaltedJoin {

  def apply(
      skewed: DataFrame,
      small: DataFrame,
      skewedKey: String,
      smallKey: String,
      salts: Int): DataFrame = {

    // deterministic per-row salt: hash of the whole row, not a rand() —
    // reruns and retries produce identical partitioning
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(salts)))

    val replicated = small
      .withColumn("_salt", explode(array((0 until salts).map(lit(_)): _*)))
      .withColumn("_salt", col("_salt").cast("long"))

    salted.join(replicated,
        salted(skewedKey) === replicated(smallKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
