package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The PPM codec must round-trip exactly, tolerate the header freedoms
  * the netpbm spec allows (arbitrary whitespace, # comments), and
  * refuse every malformation class rather than mis-parse it.
  */
class PpmCodecSpec extends AnyFunSuite {

  private def pixel(x: Int, y: Int, c: Int): Int = (x * 7 + y * 13 + c * 101) % 256

  test("encode → decode round-trips dimensions and channel sums exactly") {
    val w = 5
    val h = 3
    val bytes = Multimodal.encodePpm(w, h, pixel)
    val want = (0 until 3).map { c =>
      (for { y <- 0 until h; x <- 0 until w } yield pixel(x, y, c).toLong).sum
    }
    assert(Multimodal.decodePpm(bytes) ===
      Some((w, h, want(0), want(1), want(2))))
  }

  test("header tolerates comments and extra whitespace") {
    val raster = Array.tabulate(4 * 2 * 3)(i => (i * 3 % 256).toByte)
    val header = "P6 # a comment\n #another\n  4\t2\r\n255\n".getBytes("US-ASCII")
    val got = Multimodal.decodePpm(header ++ raster)
    assert(got.isDefined)
    assert(got.get._1 === 4)
    assert(got.get._2 === 2)
  }

  test("resizePpm samples the nearest-neighbor grid and re-encodes valid P6") {
    val src = Multimodal.encodePpm(5, 3, pixel) // odd dims: ceil division
    val out = Multimodal.resizePpm(src, 2)
    assert(out.isDefined)
    // 5x3 / 2 -> 3x2; output pixel (x,y,c) = source (2x,2y,c)
    val want = (0 until 3).map { c =>
      (for { y <- 0 until 2; x <- 0 until 3 } yield pixel(2 * x, 2 * y, c).toLong).sum
    }
    assert(Multimodal.decodePpm(out.get) ===
      Some((3, 2, want(0), want(1), want(2))))
    // factor 1 is the identity
    assert(Multimodal.resizePpm(src, 1).map(_.toSeq) === Some(src.toSeq))
    assert(Multimodal.resizePpm(Array[Byte]('P', '5'), 2) === None)
  }

  test("malformed inputs are refused, not mis-parsed") {
    val good = Multimodal.encodePpm(4, 2, pixel)
    assert(Multimodal.decodePpm(null) === None)
    assert(Multimodal.decodePpm(Array[Byte]('P', '5')) === None) // wrong magic
    assert(Multimodal.decodePpm(good.dropRight(1)) === None) // short raster
    assert(Multimodal.decodePpm(good :+ 0.toByte) === None) // trailing junk
    val maxval254 = "P6\n4 2\n254\n".getBytes("US-ASCII") ++ good.takeRight(24)
    assert(Multimodal.decodePpm(maxval254) === None) // unsupported maxval
    assert(Multimodal.decodePpm("P6\n4 2\n255\n".getBytes("US-ASCII")) === None)
  }

  test("dhash64: brightness-invariant, structure-sensitive, strict on input") {
    def img(bright: Int, xc: Int, yc: Int) =
      Multimodal.encodePpm(18, 16,
        (x, y, c) => ((x * xc + y * yc + c * 3) % 193) + bright)
    val base = Multimodal.dhash64(img(0, 23, 41))
    assert(base.isDefined)
    // a global brightness shift (no clamping: 192 + 48 < 256) must not
    // change a single bit — the re-exposure invariance the near-dup
    // bucketing relies on
    for (b <- Seq(8, 24, 48))
      assert(Multimodal.dhash64(img(b, 23, 41)) === base,
        s"brightness +$b changed the perceptual hash")
    // different gradients = different images must separate
    assert(Multimodal.dhash64(img(0, 40, 70)) !== base)
    // strictness: malformed or sub-grid images refuse, not mis-hash
    assert(Multimodal.dhash64(null) === None)
    assert(Multimodal.dhash64(
      Multimodal.encodePpm(8, 8, (_, _, _) => 1)) === None) // < 9 wide
    assert(Multimodal.dhash64(img(0, 23, 41).dropRight(1)) === None)
  }
}
