package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash + LSH banding over shingle arrays, composed entirely from
  * Spark built-ins (transform / array_min / xxhash64 / slice), so
  * signature computation is codegen'd and shuffles carry only compact
  * signatures — the property that makes near-dup detection viable at
  * 100 TB (cost is O(n·k) hashing + a bucket-grouped shuffle instead of
  * an O(n²) pairwise compare).
  */
object MinHashFns {

  /** k-permutation MinHash signature: element j = min over shingles of
    * xxhash64(shingle, seed=j).
    */
  def signature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(j))))
    }: _*)

  /** LSH band keys: hash of each r-length signature slice. Docs sharing
    * any band key become candidate pairs. b bands of r rows ≈ S-curve
    * threshold (1/b)^(1/r).
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { i =>
      xxhash64(slice(sig, i * rows + 1, rows), lit(i))
    }: _*)
}
