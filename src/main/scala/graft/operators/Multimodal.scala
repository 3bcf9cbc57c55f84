package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, plus a partition-wise decode /
  * feature-extract operator.
  *
  * The Spark-side shape is real and load-bearing: schema, per-partition
  * batching (mapPartitions — the Scala analogue of mapInPandas), output
  * encoder, and the parquet round-trip. The CODEC itself is a clearly
  * marked deterministic stub — this container ships no image/audio
  * libraries, so `decodeStub` derives features from the raw bytes
  * (length, head byte, simple checksum); swapping in a real decoder
  * changes only the function body, not the distributed plumbing.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("w", IntegerType, nullable = true),
      StructField("h", IntegerType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = true),
    StructField("head_byte", LongType, nullable = true),
    StructField("byte_sum_mod", LongType, nullable = true)))

  /** STUB decode: deterministic features from raw bytes. A real
    * implementation would decode the payload (image resize, audio
    * resample, frame sample) here — per partition, streaming, no
    * driver-side collection.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    if (payload == null || payload.isEmpty) (0L, -1L, 0L)
    else {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xffL; i += 1 }
      (payload.length.toLong, (payload(0) & 0xffL), sum % 256L)
    }
  }

  /** Partition-wise feature extraction over an asset DataFrame
    * (asset_id, payload, meta). One pass per partition; output rows
    * carry the extracted features.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val (n, head, sum) = decodeStub(payload)
          Row(id, n, head, sum)
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame_len", LongType, nullable = false),
    StructField("head_byte", LongType, nullable = false)))

  /** Frame sampling: split each payload into `nFrames` contiguous byte
    * ranges ("frames") and emit one feature row per frame — the video
    * frame-sample / audio chunking shape. The STUB "decode" reports each
    * frame's length and first byte; a real codec would decode the slice.
    * mapPartitions + iterator flatMap: streaming per partition, output
    * fan-out nFrames×, no driver-side collection.
    */
  def sampleFrames(assets: DataFrame, nFrames: Int): DataFrame = {
    val enc = Encoders.row(frameSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val len = payload.length
          (0 until nFrames).iterator.map { f =>
            val start = f.toLong * len / nFrames
            val end = (f + 1).toLong * len / nFrames
            val head = if (end > start) payload(start.toInt) & 0xffL else -1L
            Row(id, f.toLong, end - start, head)
          }
        }
      }(enc)
  }

  val audioWindowSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("window_idx", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_amp", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", LongType, nullable = false)))

  /** Audio-shaped feature extraction: treat the payload as a stream of
    * unsigned 8-bit samples, cut it into fixed non-overlapping windows,
    * and emit per-window amplitude statistics (count, sum, sum of
    * squares, peak) — the windowed-RMS/peak shape an audio pipeline
    * computes per clip. All-integer outputs, so results are exact and
    * hash-comparable (RMS itself is sqrt(sum_sq/n) — derived downstream
    * when needed, keeping the stored feature exact). A real
    * implementation swaps the byte stream for decoded PCM; the window
    * loop, schema, and partition-streaming shape are unchanged.
    */
  def audioWindows(assets: DataFrame, windowBytes: Int): DataFrame = {
    require(windowBytes > 0, "windowBytes must be positive")
    val enc = Encoders.row(audioWindowSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload =
            if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val nWin = (payload.length + windowBytes - 1) / windowBytes
          (0 until nWin).iterator.map { w =>
            val start = w * windowBytes
            val end = math.min(start + windowBytes, payload.length)
            var i = start; var sum = 0L; var sumSq = 0L; var peak = 0L
            while (i < end) {
              val v = payload(i) & 0xffL
              sum += v; sumSq += v * v; if (v > peak) peak = v
              i += 1
            }
            Row(id, w.toLong, (end - start).toLong, sum, sumSq, peak)
          }
        }
      }(enc)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("w", IntegerType, nullable = true),
      StructField("h", IntegerType, nullable = true))), nullable = true)))

  /** STUB resize: keep every `factor`-th byte — the payload→payload
    * transformation shape (image downscale, audio downsample) with the
    * metadata struct updated to the new "resolution". A real codec would
    * decode, resample, and re-encode the slice; the partition-wise
    * streaming, binary-in/binary-out encoder, and meta bookkeeping are
    * exactly what it would run on.
    */
  def resize(assets: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, "resize factor must be positive")
    val enc = Encoders.row(resizedSchema)
    assets.select(col("asset_id"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val meta = if (r.isNullAt(2)) null else r.getStruct(2)
          val out =
            if (payload == null) null
            else Array.tabulate((payload.length + factor - 1) / factor)(i => payload(i * factor))
          val newMeta =
            if (meta == null) null
            else Row(meta.getString(0),
              if (meta.isNullAt(1)) null else Int.box((meta.getInt(1) + factor - 1) / factor),
              if (meta.isNullAt(2)) null else Int.box(meta.getInt(2)))
          Row(id, out, newMeta)
        }
      }(enc)
  }

  // ------------------------------------------------------------------
  // REAL image codec: PPM (P6). Unlike decodeStub (kept for formats
  // that need external libraries this container lacks), PPM is a
  // header + raw-RGB format parseable in pure JVM code — so this path
  // runs an ACTUAL encode → store → parse → feature round trip: the
  // encoder writes genuine P6 files, the decoder is a strict parser
  // (magic, whitespace/comment-tolerant header, exact payload length),
  // and q26_ppm_decode's oracle recomputes channel sums closed-form —
  // a header-skip or stride bug mismatches the hash.
  // ------------------------------------------------------------------

  /** Encode a genuine PPM (P6) image: `pixel(x, y, c)` gives channel
    * `c` (0=R,1=G,2=B) of pixel (x, y) in [0, 255]; layout is the spec's
    * row-major interleaved RGB after an ASCII `P6\nW H\n255\n` header.
    */
  def encodePpm(width: Int, height: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "PPM dimensions must be positive")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](width * height * 3)
    var i = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var c = 0
        while (c < 3) { body(i) = (pixel(x, y, c) & 0xff).toByte; i += 1; c += 1 }
        x += 1
      }
      y += 1
    }
    header ++ body
  }

  /** Strict P6 header parse → `(w, h, rasterOffset)`; None on anything
    * malformed (bad magic, non-numeric header, maxval != 255, short or
    * oversized payload). Header tokenization skips whitespace and
    * `#`-comments per the netpbm spec; exactly ONE whitespace byte
    * separates maxval from the binary raster.
    */
  def parsePpmHeader(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < 2 ||
      payload(0) != 'P' || payload(1) != '6') return None
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def nextInt(): Option[Int] = {
      while (i < payload.length &&
        (isWs(payload(i)) || payload(i) == '#')) {
        if (payload(i) == '#') {
          while (i < payload.length && payload(i) != '\n') i += 1
        } else i += 1
      }
      val start = i
      var v = 0L
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0')
        if (v > Int.MaxValue) return None
        i += 1
      }
      if (i == start) None else Some(v.toInt)
    }
    for {
      w <- nextInt()
      h <- nextInt()
      maxval <- nextInt()
      if maxval == 255 && w > 0 && h > 0
      if i < payload.length && isWs(payload(i))
      _ = { i += 1 } // the single whitespace before the raster
      if (payload.length - i).toLong == w.toLong * h * 3
    } yield (w, h, i)
  }

  /** 64-bit difference hash (dHash) of a P6 image — the standard
    * perceptual near-dup key for image corpora: integer luminance
    * (r+g+b, unscaled — monotone in brightness, which is all the sign
    * comparisons need), exact box-average downsample to a 9×8 grid
    * (grid cell (gx, gy) covers [gx·w/9, (gx+1)·w/9) × [gy·h/8,
    * (gy+1)·h/8)), bit (gy·8 + gx) set iff cell (gx, gy) is darker than
    * its right neighbor. All-integer arithmetic → deterministic; and
    * because only ADJACENT-cell comparisons enter the hash, a global
    * brightness shift (every pixel + k, no clamping) leaves the hash
    * unchanged — the invariance that buckets re-encoded/re-exposed
    * copies of one image together while distinct images separate.
    * None for malformed payloads or images smaller than the 9×8 grid.
    */
  def dhash64(payload: Array[Byte]): Option[Long] =
    parsePpmHeader(payload).flatMap { case (w, h, off) =>
      if (w < 9 || h < 8) None
      else {
        val lum = new Array[Long](9 * 8)
        var gy = 0
        while (gy < 8) {
          val y0 = gy * h / 8
          val y1 = (gy + 1) * h / 8
          var gx = 0
          while (gx < 9) {
            val x0 = gx * w / 9
            val x1 = (gx + 1) * w / 9
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = off + (y * w + x) * 3
                sum += (payload(p) & 0xff) + (payload(p + 1) & 0xff) +
                  (payload(p + 2) & 0xff)
                x += 1
              }
              y += 1
            }
            // average over the cell so uneven grid-cell sizes cannot
            // bias the comparison; integer division is fine — both
            // sides of every comparison use the same scale
            lum(gy * 9 + gx) = sum / ((x1 - x0).toLong * (y1 - y0))
            gx += 1
          }
          gy += 1
        }
        var bits = 0L
        var i = 0
        while (i < 8 * 8) {
          val gy2 = i / 8
          val gx2 = i % 8
          if (lum(gy2 * 9 + gx2) < lum(gy2 * 9 + gx2 + 1)) bits |= 1L << i
          i += 1
        }
        Some(bits)
      }
    }

  /** Strict P6 parse → `(w, h, sumR, sumG, sumB)`; None on malformed. */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    parsePpmHeader(payload).map { case (w, h, off) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var p = off
      val end = payload.length
      while (p < end) {
        sr += payload(p) & 0xffL
        sg += payload(p + 1) & 0xffL
        sb += payload(p + 2) & 0xffL
        p += 3
      }
      (w, h, sr, sg, sb)
    }

  /** REAL image resize: nearest-neighbor downscale of a P6 image by an
    * integer factor — output pixel (x, y) samples source
    * (x·factor, y·factor) — re-encoded as P6. The decode → transform →
    * re-encode loop the byte-stub `resize` stands in for on formats
    * needing external codecs. None on malformed input.
    */
  def resizePpm(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    require(factor > 0, "resize factor must be positive")
    parsePpmHeader(payload).map { case (w, h, off) =>
      val ow = (w - 1) / factor + 1
      val oh = (h - 1) / factor + 1
      encodePpm(ow, oh, (x, y, c) =>
        payload(off + (y * factor * w + x * factor) * 3 + c) & 0xff)
    }
  }

  val ppmFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("w", LongType, nullable = true),
    StructField("h", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  val ppmAssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Partition-wise REAL resize over `(asset_id, payload)` P6 assets:
    * payload → payload, malformed → null payload (propagates to null
    * feature rows downstream, never dropped).
    */
  def resizePpmAssets(assets: DataFrame, factor: Int): DataFrame = {
    val enc = Encoders.row(ppmAssetSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(id, resizePpm(p, factor).orNull)
        }
      }(enc)
  }

  /** Partition-wise PPM decode over `(asset_id, payload)`: real parse,
    * per-channel integer sums; malformed payloads surface as null
    * features (visible in the output, never silently dropped).
    */
  def decodePpmFeatures(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(ppmFeatureSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          decodePpm(payload) match {
            case Some((w, h, sr, sg, sb)) =>
              Row(id, w.toLong, h.toLong, sr, sg, sb)
            case None => Row(id, null, null, null, null, null)
          }
        }
      }(enc)
  }

  // ------------------------------------------------------------------
  // REAL audio codec: WAV (RIFF, PCM16 mono). Like PPM, WAV is
  // parseable in pure JVM code — the encoder writes genuine RIFF files
  // and the decoder is a strict chunk walker (magic, fmt validation,
  // unknown-chunk skipping with even padding, exact data length), so
  // q26_wav_decode runs an actual encode → store → parse → window-
  // feature round trip against a closed-form oracle.
  // ------------------------------------------------------------------

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode genuine mono PCM16 WAV: RIFF header, canonical 16-byte
    * `fmt ` chunk, `data` chunk of little-endian samples.
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putLe32(out, 4, 36 + dataLen)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putLe32(out, 16, 16) // fmt chunk size
    out(20) = 1 // PCM
    out(22) = 1 // mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * 2) // byte rate
    out(32) = 2 // block align
    out(34) = 16 // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putLe32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      out(44 + 2 * i) = (s & 0xff).toByte
      out(45 + 2 * i) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Strict RIFF/WAVE walker → (sampleRate, samples); None on anything
    * malformed (bad magic, wrong RIFF size, non-PCM16-mono fmt, odd or
    * overrunning data length, missing chunks). Unknown chunks are
    * skipped with the spec's even-byte padding.
    */
  def decodeWavPcm16(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload == null || payload.length < 44) return None
    def tag(off: Int): String = new String(payload, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    if (le32(payload, 4) != payload.length - 8) return None
    var fmtOk = false
    var sampleRate = 0
    var samples: Array[Short] = null
    var i = 12
    while (i + 8 <= payload.length) {
      val id = tag(i)
      val size = le32(payload, i + 4)
      // Long arithmetic: a corrupt ~2^31 size field must fail the bound
      // check, not wrap negative past it
      if (size < 0 || i.toLong + 8 + size > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val codec = le16(payload, i + 8)
          val channels = le16(payload, i + 10)
          sampleRate = le32(payload, i + 12)
          val bits = le16(payload, i + 22)
          if (codec != 1 || channels != 1 || bits != 16) return None
          fmtOk = true
        case "data" =>
          if (!fmtOk || size % 2 != 0) return None
          val n = size / 2
          samples = new Array[Short](n)
          var j = 0
          while (j < n) {
            samples(j) = le16(payload, i + 8 + 2 * j).toShort
            j += 1
          }
        case _ => () // unknown chunk: skip
      }
      i += 8 + size + (size & 1) // chunks pad to even length
    }
    if (fmtOk && samples != null) Some((sampleRate, samples)) else None
  }

  val wavWindowSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("window_idx", LongType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("sum_amp", LongType, nullable = true),
    StructField("sum_sq", LongType, nullable = true),
    StructField("peak_abs", LongType, nullable = true)))

  /** Partition-wise WAV decode + windowed PCM features over
    * `(asset_id, payload)`: real parse, then per fixed-size sample
    * window exact integer stats (sum, sum of squares, peak |amp|).
    * Malformed payloads emit one all-null row — visible, never dropped.
    */
  def decodeWavWindows(assets: DataFrame, windowSamples: Int): DataFrame = {
    require(windowSamples > 0, "windowSamples must be positive")
    val enc = Encoders.row(wavWindowSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          decodeWavPcm16(payload) match {
            case None =>
              Iterator.single(Row(id, null, null, null, null, null))
            case Some((_, samples)) if samples.isEmpty =>
              // structurally valid WAV with an empty data chunk: emit
              // one zero-sample row so the asset stays VISIBLE in the
              // feature table (the same accounting contract malformed
              // payloads get via their all-null row)
              Iterator.single(Row(id, 0L, 0L, 0L, 0L, 0L))
            case Some((_, samples)) =>
              val nWin = (samples.length + windowSamples - 1) / windowSamples
              (0 until nWin).iterator.map { w =>
                val start = w * windowSamples
                val end = math.min(start + windowSamples, samples.length)
                var j = start; var sum = 0L; var sumSq = 0L; var peak = 0L
                while (j < end) {
                  val v = samples(j).toLong
                  sum += v; sumSq += v * v
                  val a = math.abs(v)
                  if (a > peak) peak = a
                  j += 1
                }
                Row(id, w.toLong, (end - start).toLong, sum, sumSq, peak)
              }
          }
        }
      }(enc)
  }

  /** Build an asset table from documents (text payload stands in for a
    * real media payload) — used by q26 and the specs.
    */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("text/plain").as("mime"),
          col("n_chars").cast("int").as("w"),
          lit(0).as("h")).as("meta"))

  /** ORDER-SENSITIVE sequence fingerprint for frame sequences (the
    * video analogue of a single image's dHash): each frame contributes
    * the low `bitsPerFrame` bits of its per-frame hash, placed
    * POSITIONALLY — the fold is `acc * 2^bitsPerFrame + bits` over
    * frames in `orderCol` order, so frame f occupies its own bit
    * window of the signature. Consequences, both load-bearing:
    *   - reordering the same frames changes the windows their codes
    *     land in → a re-cut of the same footage does NOT collide
    *     (unlike any order-free fold such as XOR/sum of frame hashes);
    *   - flipping k bits inside one frame's contributed code flips
    *     exactly k signature bits → per-frame noise stays LOCAL, and a
    *     Hamming-ball tier over the signature (hammingBandPairs + CC,
    *     the q72/q77 discipline) catches noisy re-encodes.
    * Input: one row per frame (idCol, orderCol, hashCol); output one
    * row per asset (idCol, vfp). Entirely codegen'd built-in HOFs
    * (collect_list → array_sort → aggregate), grouped by asset — one
    * shuffle of per-frame 8-byte hashes, never frame bytes.
    *
    * `frames * bitsPerFrame` must stay ≤ 62: the fold accumulates on a
    * SIGNED long under ANSI mode (the q73 lesson) — with the default 7
    * bits that is ≤ 8 frames per asset; longer videos first sample
    * down to a fixed frame budget (`sampleFrames`). The budget is
    * ENFORCED per asset with a loud error (the requireSmallExact
    * discipline): an over-budget asset would otherwise either abort
    * the job with an opaque mid-fold overflow ArithmeticException
    * (ANSI on) or silently shift its early frames out of the signature
    * (ANSI off) — breaking exactly the order-sensitivity this function
    * promises, data-dependently.
    */
  def frameSequenceSignature(
      frames: DataFrame, idCol: String, orderCol: String, hashCol: String,
      bitsPerFrame: Int = 7): DataFrame = {
    require(bitsPerFrame >= 1 && bitsPerFrame <= 62,
      s"bitsPerFrame=$bitsPerFrame out of range")
    val maxFrames = 62 / bitsPerFrame
    val mask = (1L << bitsPerFrame) - 1
    frames.groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col(orderCol), col(hashCol)))),
        w => w.getField(hashCol)).as("fhs"))
      .select(col(idCol),
        when(size(col("fhs")) > maxFrames,
          raise_error(concat(
            lit("frameSequenceSignature: asset "),
            col(idCol).cast("string"),
            lit(" has "), size(col("fhs")).cast("string"),
            lit(s" frames but at bitsPerFrame=$bitsPerFrame the 62-bit " +
              s"signature holds at most $maxFrames — sample the sequence " +
              "down first (sampleFrames)"))))
          .otherwise(aggregate(col("fhs"), lit(0L),
            (acc, fh) => acc * lit(1L << bitsPerFrame) +
              fh.bitwiseAND(lit(mask)))).as("vfp"))
  }
}
