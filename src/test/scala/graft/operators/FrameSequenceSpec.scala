package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal.frameSequenceSignature (the q82 video near-dup key): the
  * fingerprint must be ORDER-SENSITIVE (a re-cut of the same frames
  * does not collide), per-frame-LOCAL in Hamming space (k flipped bits
  * in one frame's code flip exactly k signature bits), and — through
  * the q82 fixture frames — exposure-invariant end to end (brightness
  * variants of the same video collide exactly).
  */
class FrameSequenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sigOf(frames: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Multimodal
      .frameSequenceSignature(
        frames.toDF("asset_id", "frame_idx", "fh"),
        "asset_id", "frame_idx", "fh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("same frame multiset in a different order yields a different " +
      "signature (re-cuts do not collide)") {
    val a = Seq[(Long, Long, Long)]((1L, 0L, 5L), (1L, 1L, 9L), (1L, 2L, 77L))
    val b = Seq[(Long, Long, Long)]((2L, 0L, 77L), (2L, 1L, 9L), (2L, 2L, 5L))
    val sigs = sigOf(a ++ b)
    assert(sigs(1L) != sigs(2L),
      "an order-free fold (xor/sum) would collide here")
  }

  test("identical sequences collide; k bit flips in one frame flip " +
      "exactly k signature bits (noise stays local)") {
    val a = Seq[(Long, Long, Long)]((1L, 0L, 5L), (1L, 1L, 9L), (1L, 2L, 77L))
    val same = Seq[(Long, Long, Long)]((3L, 0L, 5L), (3L, 1L, 9L), (3L, 2L, 77L))
    // flip 2 bits inside frame 1's 7-bit code (9 ^ 0b101 = 12)
    val noisy = Seq[(Long, Long, Long)]((4L, 0L, 5L), (4L, 1L, 12L), (4L, 2L, 77L))
    val sigs = sigOf(a ++ same ++ noisy)
    assert(sigs(1L) == sigs(3L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) == 2)
  }

  test("only the low bitsPerFrame bits of each frame hash contribute " +
      "(high dHash rows are masked off)") {
    val a = Seq[(Long, Long, Long)]((1L, 0L, 5L), (1L, 1L, 9L))
    val highBits = Seq[(Long, Long, Long)](
      (2L, 0L, 5L | (1L << 40)), (2L, 1L, 9L | (1L << 9)))
    val sigs = sigOf(a ++ highBits)
    assert(sigs(1L) == sigs(2L))
  }

  test("an asset exceeding the 62-bit frame budget fails LOUDLY, not " +
      "with a mid-fold overflow or silent bit loss") {
    import spark.implicits._
    // 9 frames at bitsPerFrame=7 needs 63 bits: pre-guard this either
    // threw an opaque ArithmeticException under ANSI or silently
    // shifted frame 0 out of the signature with ANSI off
    val over = (0 until 9).map(f => (1L, f.toLong, (f + 1).toLong))
    val err = intercept[Exception] {
      Multimodal.frameSequenceSignature(
        over.toDF("asset_id", "frame_idx", "fh"),
        "asset_id", "frame_idx", "fh").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(m =>
      m.contains("frameSequenceSignature") && m.contains("at most 8")),
      s"expected the frame-budget error, got: ${msgs(err).mkString(" | ")}")
    // exactly at the budget still works
    val atCap = (0 until 8).map(f => (2L, f.toLong, (f + 1).toLong))
    val sigs = sigOf(atCap)
    assert(sigs.contains(2L))
  }

  test("q82 fixture frames: brightness variants of one video produce " +
      "the SAME signature; distinct motifs produce distant ones") {
    import spark.implicits._
    val idA = 1L   // motif 1
    val idB = 49L  // motif 1, different noise variant (49/48 = 1)
    val idC = 4L   // motif 4
    val frames = Seq(idA, idB, idC).flatMap { id =>
      val p = graft.queries.LlmOps.q82Pattern(id)
      Seq(0, 24).flatMap { bright => // two exposure levels
        (0 until 8).map { f =>
          (id * 100 + bright, f.toLong,
            Multimodal.dhash64(graft.queries.LlmOps.q82Frame(p, f, bright))
              .getOrElse(fail(s"malformed frame $id/$f")))
        }
      }
    }
    val sigs = sigOf(frames)
    assert(sigs(idA * 100) == sigs(idA * 100 + 24),
      "exposure must not change the sequence signature")
    val dAB = java.lang.Long.bitCount(sigs(idA * 100) ^ sigs(idB * 100))
    val dAC = java.lang.Long.bitCount(sigs(idA * 100) ^ sigs(idC * 100))
    assert(dAB >= 1 && dAB <= 3,
      s"within-motif variants must sit inside the Hamming ball, got $dAB")
    assert(dAC >= 12, s"cross-motif signatures must stay distant, got $dAC")
  }
}
