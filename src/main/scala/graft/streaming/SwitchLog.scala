package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The durable switch log behind the streaming-index serving pointer
  * (q86's inline switch, q90's FoldMachine): one overwrite-keyed record
  * per adopted retrain at `root/req=R` carrying
  * `(req, folded_through, at_gen)`.
  *
  * The r13 verdict's lead finding lives here: deriving the pointer by
  * READING every historical record costs one 1-row Spark job per
  * retrain ever adopted, several times per trigger — per-trigger driver
  * cost growing with the stream's lifetime (the same creep family as
  * the generation creep fixed by q87 and the tombstone creep fixed by
  * q91). The fix keeps the durable-state discipline but splits the two
  * questions a trigger actually asks:
  *
  *   - [[adopted]] — WHICH retrains have switched. Membership needs
  *     only the request IDS, and those are the directory names: a
  *     listing, zero record reads, O(history) only in dentries (and on
  *     a real store a single LIST call).
  *   - [[pointer]] — WHERE serving points now. Only the MAX record's
  *     `folded_through` matters, so this is exactly ONE 1-row read per
  *     call regardless of how many retrains the stream has ever
  *     adopted.
  *
  * A trigger calls [[pointer]] once → per-trigger record reads are O(1)
  * in switch history. [[recordReads]] is the per-root probe the q86/q90
  * contracts assert on (`ptr_reads_bounded`): the bound is enforced by
  * the queries' own durable logs, not trusted from this comment.
  *
  * The LIVE listing itself is bounded by [[archive]] (q94): closed
  * records are consolidated into one parquet under `root/archive/` and
  * their directories swept, so a month-long stream's switch root holds
  * `keep` live dirs + one checkpoint, not one dir per adoption ever —
  * and the audit path reads the whole closed history in one job.
  */
object SwitchLog {

  private val counters = new ConcurrentHashMap[String, AtomicLong]()

  /** Total switch-record read JOBS ever issued against `root` in this
    * JVM — the probe behind the `ptr_reads_bounded` contracts. The
    * unit is deliberately the driver-side Spark job, because that is
    * what the r13 creep was made of (one 1-row job per historical
    * record, per trigger): a single multi-path read that consolidates
    * several records (archival) counts once, and the consolidated
    * archive read counts once however much history it carries —
    * that consolidation is exactly the cost structure the archive
    * exists to buy. Listings are deliberately not counted: they are
    * the cheap path the design moves membership checks onto.
    */
  def recordReads(root: String): Long =
    Option(counters.get(root)).map(_.get()).getOrElse(0L)

  /** LIVE adopted retrain request ids, sorted — a directory listing, NO
    * record reads. With archival ([[archive]]) this is the newest
    * `keep` records only; the full adopted set is the archive ∪ this,
    * but no trigger-path decision needs the full set: membership
    * checks reduce to "req > max live" because adoption order follows
    * request order (enforced at [[write]]) and the newest record is
    * never archived (`keep ≥ 1`), so max-live IS the global max.
    */
  def adopted(spark: SparkSession, root: String): Seq[Long] =
    StreamOps.genDirs(spark, root, "req=")

  // ---- archival checkpoint (q94) -----------------------------------
  // The switch log was the one durable collection in the retrain
  // family still growing one DIRECTORY per adoption forever (~720 a
  // month at hour-scale retrains): per-trigger listings are cheap but
  // O(lifetime), and the audit path paid one 1-row Spark job per
  // historical record. `archive` folds every live record except the
  // newest `keep` into ONE small parquet at `root/archive/upto=R`, so
  // the live listing is bounded for the stream's lifetime and the
  // audit path reads the whole closed history in ONE job. The records
  // are write-once facts (req, folded_through, at_gen), so the
  // consolidated copy is byte-equivalent history, not a summary —
  // time-travel ([[pointerAsOf]]) stays exact through it.

  /** Archive checkpoint ids (`upto=R` suffixes), sorted. More than one
    * exists only inside a crash window between writing a new
    * consolidated archive and sweeping its predecessor; readers union
    * + dedup, and the next [[archive]] call converges back to one. */
  def archives(spark: SparkSession, root: String): Seq[Long] =
    StreamOps.genDirs(spark, s"$root/archive", "upto=")

  /** The consolidated closed history, read in ONE job (None when no
    * archive exists). Dedup by `req` absorbs every crash window: a
    * record can transiently sit in two archive checkpoints (new
    * written, old not yet swept) or in the archive AND live (live dir
    * not yet swept) — the copies are identical write-once facts.
    * Counts ONE probe read: the point of consolidation is that the
    * whole history costs one job, and the probe must say so honestly.
    */
  def archivedRecords(spark: SparkSession, root: String): Option[DataFrame] = {
    val ups = archives(spark, root)
    if (ups.isEmpty) None
    else {
      counters.computeIfAbsent(root, _ => new AtomicLong()).incrementAndGet()
      Some(spark.read.parquet(ups.map(u => s"$root/archive/upto=$u"): _*)
        .dropDuplicates("req"))
    }
  }

  /** Fold all live records except the newest `keep` into the
    * consolidated archive and sweep them — the once-per-adoption
    * bounding step (never on the quiet trigger path). Returns how many
    * live records were moved out of the live listing (0 when
    * live ≤ keep).
    *
    * `keep ≥ 1` is load-bearing: [[pointer]] and [[write]]'s ordering
    * check read the LIVE listing only, which is sound exactly because
    * the newest record is never archived. Write order is
    * crash-idempotent: the new checkpoint (a superset union of every
    * existing checkpoint + the records being archived) lands FIRST
    * under a strictly NEWER key, then superseded checkpoints are
    * swept, then the archived live dirs — a crash anywhere leaves a
    * readable superset that [[archivedRecords]] dedups and the next
    * call re-converges. A checkpoint is never rewritten in place:
    * when every record being archived is already covered by the
    * newest checkpoint (the half-sweep crash window — a live dir
    * survived behind a checkpoint that contains it, which the
    * prefix/induction invariant below guarantees), the write is
    * SKIPPED and only the leftover live dirs are swept, because an
    * in-place overwrite would derive the replacement from the very
    * file being deleted — the one non-crash-safe shape in the
    * protocol. (Invariant: any live record with req ≤ the newest
    * checkpoint's key is contained in that checkpoint — `toArchive`
    * is always a PREFIX of the sorted live listing, so a record below
    * the key was in some earlier call's toArchive, whose checkpoint
    * carried it, and every later checkpoint is a superset.)
    * Amortized O(1): each record is read into a checkpoint once
    * (usually one per adoption), plus one read of the prior
    * checkpoint; one listing of the checkpoint directory per call.
    */
  def archive(spark: SparkSession, root: String, keep: Int): Long = {
    require(keep >= 1,
      s"archive keep=$keep: the newest switch record must stay live — " +
        "pointer() and the write-order check read only the live listing")
    val live = adopted(spark, root)
    if (live.size <= keep) 0L
    else {
      val toArchive = live.dropRight(keep)
      val ups = archives(spark, root)
      val existingMax = ups.maxOption.getOrElse(Long.MinValue)
      if (toArchive.max > existingMax) {
        counters.computeIfAbsent(root, _ => new AtomicLong()).incrementAndGet()
        val newRows = spark.read.parquet(
          toArchive.map(r => s"$root/req=$r"): _*)
        val prior =
          if (ups.isEmpty) None
          else {
            counters.computeIfAbsent(root, _ => new AtomicLong())
              .incrementAndGet()
            Some(spark.read.parquet(
                ups.map(u => s"$root/archive/upto=$u"): _*)
              .dropDuplicates("req"))
          }
        val allRows = prior.map(_.unionByName(newRows)).getOrElse(newRows)
          .dropDuplicates("req")
        allRows.coalesce(1).write.mode("overwrite")
          .parquet(s"$root/archive/upto=${toArchive.max}")
        ups.filter(_ < toArchive.max)
          .foreach(u => StreamOps.sweepDir(spark, s"$root/archive/upto=$u"))
      }
      else {
        // every toArchive record is already inside the newest
        // checkpoint (see invariant above) — no write, just finish the
        // interrupted sweeps, INCLUDING any superseded checkpoint the
        // crashed call left behind (the newest is a superset of every
        // older one by write order, so older keys are always safe to
        // drop; without this the stale checkpoint would survive
        // exactly the call documented to converge it, doubling every
        // archive read until some later cycle happens to rewrite)
        ups.filter(_ < existingMax)
          .foreach(u => StreamOps.sweepDir(spark, s"$root/archive/upto=$u"))
      }
      toArchive.foreach(r => StreamOps.sweepDir(spark, s"$root/req=$r"))
      toArchive.size.toLong
    }
  }

  /** Every adopted request id ever — archive ∪ live (one job + a
    * listing). The AUDIT-side completeness view; trigger paths never
    * need it. */
  def historyReqs(spark: SparkSession, root: String): Seq[Long] = {
    val arch = archivedRecords(spark, root)
      .map(_.select(col("req")).collect().map(_.getLong(0)).toSeq)
      .getOrElse(Seq.empty)
    (arch ++ adopted(spark, root)).distinct.sorted
  }

  /** `folded_through` of one switch record — the single 1-row read. */
  def foldedThrough(spark: SparkSession, root: String, req: Long): Long = {
    counters.computeIfAbsent(root, _ => new AtomicLong()).incrementAndGet()
    spark.read.parquet(s"$root/req=$req")
      .select(col("folded_through")).collect()(0).getLong(0)
  }

  /** The serving pointer: `(max adopted req, its folded_through)`, or
    * None before the first switch. Exactly one record read when a
    * switch exists, zero otherwise — O(1) in switch history.
    */
  def pointer(spark: SparkSession, root: String): Option[(Long, Long)] =
    adopted(spark, root).maxOption
      .map(g => (g, foldedThrough(spark, root, g)))

  /** AUDIT-path pointer: the switch that was ACTIVE as of generation
    * `gen` — the last record whose `at_gen` is at-or-before it, as
    * `(req, folded_through)`; None when `gen` predates every switch.
    * Reads the consolidated archive (when one exists) in ONE job, then
    * live records in req order, STOPPING at the first one past `gen` —
    * with archival the cost is one archive job + O(keep) 1-row reads
    * regardless of how many retrains the stream ever adopted (without
    * it, O(answer position) 1-row reads, bounded by O(adoptions)); all
    * reads counted by the probe. This is the OFFLINE time-travel path
    * for audits and reproducibility queries, never the trigger path —
    * triggers only ever need the current pointer, which stays O(1)
    * via [[pointer]]. The short-circuit leans on `at_gen` being
    * monotone in `req`. That holds by construction: [[write]] rejects
    * an out-of-order req, and given req order, at_gen order is a
    * THEOREM of the protocol — a new request only fires after the
    * previous adoption (coalescing), and an adoption strictly follows
    * its own request's generation, so at_gen' ≥ req' + 1 > req' ≥
    * previous at_gen. The scan additionally re-verifies every row it
    * reads (archived and live) as a belt against hand-written records.
    */
  def pointerAsOf(
      spark: SparkSession, root: String, gen: Long): Option[(Long, Long)] = {
    var last = Option.empty[(Long, Long)]
    var past = false
    var prevAtGen = Long.MinValue
    var maxArchivedReq = Long.MinValue
    // archived prefix first: the whole CLOSED history in one read (the
    // q94 payoff — with archival the audit path is O(keep) record
    // reads + one archive job, no longer O(adoptions)); the scan over
    // the collected rows is driver-local, no further jobs
    archivedRecords(spark, root).foreach { df =>
      df.select(col("req"), col("folded_through"), col("at_gen"))
        .collect().sortBy(_.getLong(0)).foreach { row =>
          val (r, atGen) = (row.getLong(0), row.getLong(2))
          require(atGen > prevAtGen,
            s"switch archive $root is not at_gen-monotone at req=$r " +
              s"($atGen after $prevAtGen) — adoptions must happen in " +
              "generation order")
          prevAtGen = atGen
          maxArchivedReq = r
          if (!past) {
            if (atGen <= gen) last = Some((r, row.getLong(1)))
            else past = true
          }
        }
    }
    // live suffix with the existing short-circuit; records at-or-below
    // the archive boundary are crash-window duplicates of archived
    // facts (a not-yet-swept live dir) — skipped, already scanned
    val it = adopted(spark, root).iterator.filter(_ > maxArchivedReq)
    while (!past && it.hasNext) {
      val r = it.next()
      counters.computeIfAbsent(root, _ => new AtomicLong()).incrementAndGet()
      val row = spark.read.parquet(s"$root/req=$r")
        .select(col("folded_through"), col("at_gen")).collect()(0)
      val atGen = row.getLong(1)
      require(atGen > prevAtGen,
        s"switch log $root is not at_gen-monotone at req=$r " +
          s"($atGen after $prevAtGen) — the as-of short-circuit would " +
          "return a wrong audit answer; adoptions must happen in " +
          "generation order")
      prevAtGen = atGen
      if (atGen <= gen) last = Some((r, row.getLong(0)))
      else past = true
    }
    last
  }

  /** The one-write durable pointer flip (overwrite-keyed by `req`).
    *
    * Enforces req-order == adoption-order at the only place records
    * are created: the coalescing discipline (at most one unadopted
    * request exists, so adoptions happen in request order) is what
    * [[pointer]]'s max-record read and [[pointerAsOf]]'s short-circuit
    * lean on, and an out-of-order write here would silently corrupt
    * both — fail it loudly instead. `req >= newest` deliberately
    * ADMITS the idempotent replay: a replayed adopting trigger
    * rewrites its OWN record, which is still the newest, because
    * structured streaming replays a batch only when no later batch
    * has committed — a replay arriving after a newer adoption cannot
    * happen, so rejecting `req < newest` forbids nothing legitimate.
    * The LIVE listing suffices under archival too: the newest record
    * is never archived (`keep ≥ 1`), so max-live is the global max.
    * Cost: one listing per ADOPTION (once per retrain cycle) — never
    * on the quiet trigger path.
    */
  def write(spark: SparkSession, root: String, req: Long,
      foldedThrough: Long, atGen: Long): Unit = {
    val newest = adopted(spark, root).lastOption.getOrElse(Long.MinValue)
    require(req >= newest,
      s"switch write req=$req at_gen=$atGen would land BEHIND the " +
        s"newest adopted record (req=$newest) in $root — adoption " +
        "order must follow request order (the coalescing discipline)")
    spark.range(1)
      .select(lit(req).as("req"), lit(foldedThrough).as("folded_through"),
        lit(atGen).as("at_gen"))
      .write.mode("overwrite").parquet(s"$root/req=$req")
    ()
  }
}
