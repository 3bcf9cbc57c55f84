package graft.sources.excel

import scala.collection.mutable

/** Header-row → column-name logic (/root/reference/src/lib.rs:441-465):
  *
  *   - a blank or missing header cell at position i becomes "Field_{i}"
  *     (0-based position within the used range);
  *   - duplicate names are suffixed "_{n}" with a per-original-name counter
  *     starting at 2; the FIRST occurrence keeps the bare name.
  *
  * Two dedup modes, selected by the `headerDedup` read option:
  *
  *   - `unique` (default, deliberate deviation — SURVEY §1.3): the
  *     reference's dedup does not check generated suffixes against
  *     literal columns, so "a, a, a_2" yields DUPLICATE output names
  *     ("a, a_2, a_2"). Arrow tolerates that; Spark name-based column
  *     resolution does not. We advance the counter until the name is
  *     free ("a, a_2, a_2_2").
  *   - `reference`: byte-for-byte replication of the reference's
  *     per-original-name counter (/root/reference/src/lib.rs:455-463).
  *     When the quirk fires (a generated suffix collides with a literal
  *     column, e.g. "a, a, a_2" → "a, a_2, a_2") the result has
  *     DUPLICATE names, which Spark cannot materialize — attribute
  *     binding in the scan hits INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND. We
  *     fail at schema time with a clear error instead, so the quirk can
  *     never silently change OR silently corrupt: quirk-free workbooks
  *     get exact reference names, colliding ones get a loud refusal
  *     naming the duplicate (pinned by HeaderNamesSpec golden tests).
  */
object HeaderNames {

  /** @param raw header cell text per position; None/empty = blank cell */
  def build(raw: Seq[Option[String]], mode: String = "unique"): Seq[String] = {
    val named = raw.zipWithIndex.map {
      case (Some(s), _) if s.nonEmpty => s
      case (_, i) => s"Field_$i"
    }
    mode match {
      case "reference" =>
        // seen counts the ORIGINAL name at each position; a count > 1
        // appends _{count} without checking the result for collisions
        val seen = mutable.Map.empty[String, Int]
        val out = named.map { name =>
          val c = seen.getOrElse(name, 0) + 1
          seen(name) = c
          if (c > 1) s"${name}_$c" else name
        }
        val dups = out.groupBy(identity).collect { case (n, o) if o.size > 1 => n }
        if (dups.nonEmpty) throw new IllegalArgumentException(
          s"headerDedup=reference reproduced the reference's duplicate-name " +
            s"quirk (${dups.mkString(", ")} appear more than once, " +
            "/root/reference/src/lib.rs:455-463); Spark cannot materialize " +
            "duplicate column names — rename the colliding header or use " +
            "headerDedup=unique")
        out
      case "unique" =>
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
      case other => throw new IllegalArgumentException(
        s"headerDedup must be 'unique' or 'reference', got '$other'")
    }
  }
}
