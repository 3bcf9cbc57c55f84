package graft.sources.excel

import scala.collection.mutable

/** Header-row → column-name logic (/root/reference/src/lib.rs:441-465):
  *
  *   - a blank or missing header cell at position i becomes "Field_{i}"
  *     (0-based position within the used range);
  *   - duplicate names are suffixed "_{n}" with a per-original-name counter
  *     starting at 2; the FIRST occurrence keeps the bare name.
  *
  * Deliberate deviation (documented; SURVEY §1.3 "quirk to decide"): the
  * reference's dedup does not check generated suffixes against literal
  * columns, so "a, a, a_2" yields DUPLICATE output names ("a, a_2, a_2").
  * Arrow tolerates that; Spark's parquet sink and name-based column
  * pruning do not. We instead guarantee uniqueness: a collision advances
  * the counter until the name is free ("a, a_2, a_2_2").
  */
object HeaderNames {

  /** @param raw header cell text per position; None/empty = blank cell */
  def build(raw: Seq[Option[String]]): Seq[String] = {
    val named = raw.zipWithIndex.map {
      case (Some(s), _) if s.nonEmpty => s
      case (_, i) => s"Field_$i"
    }
    val taken = mutable.Set.empty[String]
    val counts = mutable.Map.empty[String, Int]
    named.map { name =>
      if (!taken(name)) {
        taken += name
        counts(name) = 1
        name
      } else {
        var k = counts.getOrElse(name, 1) + 1
        var cand = s"${name}_$k"
        while (taken(cand)) { k += 1; cand = s"${name}_$k" }
        counts(name) = k
        taken += cand
        cand
      }
    }
  }
}
