package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, plus
  * batch-shaped decode / feature-extract / resize / frame-sample
  * operators.
  *
  * IMAGE decode is REAL: [[decodeImage]] uses the JDK's javax.imageio
  * (PNG/JPEG/BMP/GIF/WBMP — no external codec needed) and extracts
  * dimensions, channel count, and a mean-luminance grid feature.
  * AUDIO decode is REAL for the formats the JDK ships
  * ([[decodeAudio]] via javax.sound.sampled: WAV/AIFF/AU with PCM
  * payloads) and extracts rate/channels/duration plus an RMS-envelope
  * feature. Undecodable bytes degrade to the zero decode — the
  * corrupt-input path every large-scale pipeline needs. VIDEO kernels
  * remain deterministic stubs ([[decodeStub]]; the JDK ships no video
  * codec), with the partition-batch plumbing identical, so swapping in
  * a codec changes one function.
  *
  * Batch shape: mapPartitions over row batches (the JVM analogue of
  * `mapInPandas` — per-partition setup happens once, rows stream
  * through), never per-row UDF setup. At 100 TB: binary payloads stay
  * columnar in parquet, pruned unless selected; repartition by size
  * before decode so one giant video doesn't skew a partition.
  */
object Multimodal {

  /** Typed metadata for an opaque binary payload. */
  final case class MediaMeta(key: Long, kind: String, nBytes: Long,
                             magicHex: String)

  /** Fake decode result — stands in for (width, height, channels, pixels)
    * of a real image decode. Deterministic from content. */
  final case class DecodedImage(key: Long, width: Int, height: Int,
                                channels: Int, features: Array[Float])

  /** Sniff cheap metadata (no decode): byte length + magic bytes.
    * Pure column expressions — stays in codegen. */
  def mediaMeta(df: DataFrame, binCol: String = "content",
                keyCol: String = "key", kind: String = "image"): DataFrame =
    df.select(
      col(keyCol).cast("long").as("key"),
      lit(kind).as("kind"),
      length(col(binCol)).cast("long").as("n_bytes"),
      upper(hex(substring(col(binCol), 1, 8))).as("magic_hex"))

  /** Real image decode via the JDK's javax.imageio: returns
    * (width, height, channels, features) where features is a
    * `featureDim`-cell mean-luminance grid (row-major over a g×g grid,
    * g = ceil(sqrt(featureDim)) — a classic cheap visual signature for
    * near-dup blocking). Null/empty/undecodable bytes → the zero decode. */
  def decodeImage(bytes: Array[Byte], featureDim: Int): (Int, Int, Int, Array[Float]) = {
    val zero = (0, 0, 0, Array.fill(featureDim)(0f))
    if (bytes == null || bytes.isEmpty) return zero
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return zero // unrecognized format
      val w = img.getWidth
      val h = img.getHeight
      val channels = img.getColorModel.getNumComponents
      // floor, not ceil: with ceil a non-square featureDim maps pixels to
      // cell indices >= featureDim whose luminance would be silently
      // dropped (a dead band of the image). floor keeps every computed
      // cell in range; trailing entries stay zero when g*g < featureDim.
      // Grid means come from the SAME cell-driven lumaGrid the dHash
      // uses (a pixel-binned grid left empty cells for images narrower
      // than the grid — frozen feature cells for small thumbnails).
      val g = math.max(1, math.floor(math.sqrt(featureDim.toDouble)).toInt)
      val grid = lumaGrid(img, g, g)
      val feats = new Array[Float](featureDim)
      var i = 0
      while (i < g * g && i < featureDim) { feats(i) = grid(i) / 255f; i += 1 }
      (w, h, channels, feats)
    } catch { case scala.util.control.NonFatal(_) => zero }
  }

  /** Decoded-audio row: rate/channel/duration metadata + an RMS
    * envelope over `featureDim` equal time buckets (mean across
    * channels) — the cheap audio signature for near-dup blocking and
    * silence/clipping quality filters. */
  final case class DecodedAudio(key: Long, sampleRateHz: Int, channels: Int,
                                nFrames: Long, durationMs: Long,
                                features: Array[Float])

  /** Real audio decode via the JDK's javax.sound.sampled (WAV, AIFF,
    * AU containers with 8/16-bit PCM — no external codec): returns
    * (sampleRateHz, channels, nFrames, rms features). The envelope is
    * the per-bucket root-mean-square of normalized samples over
    * `featureDim` equal time slices. Null/empty/undecodable bytes (or
    * compressed payloads like MP3, which the JDK cannot read) → the
    * zero decode. */
  def decodeAudio(bytes: Array[Byte], featureDim: Int): (Int, Int, Long, Array[Float]) = {
    val zero = (0, 0, 0L, Array.fill(featureDim)(0f))
    if (bytes == null || bytes.isEmpty) return zero
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val pcmSigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val pcmUnsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        if (!(pcmSigned || pcmUnsigned) || (bits != 8 && bits != 16)) return zero
        val channels = fmt.getChannels
        val frameBytes = fmt.getFrameSize
        val nFrames = in.getFrameLength
        if (nFrames <= 0 || channels <= 0 || frameBytes <= 0) return zero
        val data = in.readAllBytes()
        val sumsq = new Array[Double](featureDim)
        val counts = new Array[Long](featureDim)
        val totalFrames = data.length / frameBytes
        var f = 0
        while (f < totalFrames) {
          val bucket = math.min(featureDim - 1,
            (f.toLong * featureDim / math.max(totalFrames, 1)).toInt)
          var c = 0
          while (c < channels) {
            val off = f * frameBytes + c * (bits / 8)
            val sample =
              if (bits == 8) {
                val raw = if (pcmUnsigned) (data(off) & 0xff) - 128
                          else data(off).toInt
                raw / 128.0
              } else {
                val lo = if (fmt.isBigEndian) data(off + 1) else data(off)
                val hi = if (fmt.isBigEndian) data(off) else data(off + 1)
                // unsigned: both bytes are magnitude bits — mask the high
                // byte too (sign-extension would send 0x8000, unsigned
                // silence, to -65536 instead of 0 after the midpoint shift)
                val raw =
                  if (pcmUnsigned) (((hi & 0xff) << 8) | (lo & 0xff)) - 32768
                  else (hi << 8) | (lo & 0xff)
                raw / 32768.0
              }
            sumsq(bucket) += sample * sample
            counts(bucket) += 1
            c += 1
          }
          f += 1
        }
        val feats = Array.tabulate(featureDim) { i =>
          if (counts(i) > 0) math.sqrt(sumsq(i) / counts(i)).toFloat else 0f
        }
        (fmt.getSampleRate.toInt, channels, totalFrames.toLong, feats)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => zero }
  }

  /** Batch audio decode — same partition-batch shape as
    * [[decodeImages]]; schema (key, sample_rate_hz, channels, n_frames,
    * duration_ms, features). */
  def decodeAudios(df: DataFrame, binCol: String = "content",
                   keyCol: String = "key", featureDim: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (key, bytes) =>
        val (rate, ch, frames, feats) = decodeAudio(bytes, featureDim)
        val durMs = if (rate > 0) frames * 1000L / rate else 0L
        DecodedAudio(key, rate, ch, frames, durMs, feats)
      })
      .toDF("key", "sample_rate_hz", "channels", "n_frames",
        "duration_ms", "features")
  }

  /** Deterministic stand-in for codecs the JDK does not ship (video
    * streams; compressed audio like MP3): dimensions and an n-dim
    * feature vector derived from the byte content. Same signature and
    * partition-batch shape as the real [[decodeImage]]. */
  def decodeStub(bytes: Array[Byte], featureDim: Int): (Int, Int, Int, Array[Float]) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, 0, Array.fill(featureDim)(0f))
    var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val width = 16 + math.floorMod(h, 1024).toInt
    val height = 16 + math.floorMod(h >> 10, 1024).toInt
    val features = Array.tabulate(featureDim) { d =>
      (math.floorMod(h * (2 * d + 1) + d, 1000000007L).toFloat / 1000000007L)
    }
    (width, height, 3, features)
  }

  /** Batch decode: one partition-local pass, codec state initialized once
    * per partition (the mapInPandas batch shape). `kernel` defaults to
    * the real javax.imageio decode; pass [[decodeStub]] for the
    * deterministic stand-in (audio/video shapes, reproducible tests). */
  def decodeImages(df: DataFrame, binCol: String = "content",
                   keyCol: String = "key", featureDim: Int = 64,
                   kernel: (Array[Byte], Int) => (Int, Int, Int, Array[Float])
                     = decodeImage): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup (a real codec pool) would initialize ONCE here
        it.map { case (key, bytes) =>
          val (w, h, c, f) = kernel(bytes, featureDim)
          DecodedImage(key, w, h, c, f)
        }
      }
      .toDF("key", "width", "height", "channels", "features")
  }

  /** Resize stub: recompute features at a target resolution — the
    * plumbing (projection after decode, pushdown-safe) is the point. */
  def resizeFeatures(decoded: DataFrame, targetDim: Int): DataFrame =
    decoded.select(col("key"), col("width"), col("height"), col("channels"),
      slice(col("features"), 1, targetDim).as("features"))

  /** Frame sampling for video-shaped payloads: every `stride`-th chunk of
    * the binary becomes a "frame" row (explode shape — the real kernel
    * would emit decoded frames). */
  def sampleFrames(df: DataFrame, binCol: String = "content",
                   keyCol: String = "key", frameSize: Int = 4096,
                   stride: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (key, bytes) =>
        val n = if (bytes == null) 0 else bytes.length
        val frames = (0 until n by frameSize * stride).zipWithIndex
        frames.map { case (off, idx) =>
          (key, idx, bytes.slice(off, math.min(off + frameSize, n)))
        }
      }
      .toDF("key", "frame_idx", "frame")
  }

  /** Mean-luminance grid of an image: `gw` x `gh` cells, row-major.
    * CELL-DRIVEN (each cell averages its pixel RANGE, with a
    * nearest-neighbor floor of one pixel), not pixel-driven — a
    * pixel-to-cell binning leaves empty cells (mean 0) whenever the
    * image is narrower than the grid, which freezes whole dHash bit
    * columns for small thumbnails and biases unrelated ones toward the
    * near-dup threshold. Range sampling never leaves a cell empty. */
  private def lumaGrid(img: java.awt.image.BufferedImage,
                       gw: Int, gh: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Float](gw * gh)
    var r = 0
    while (r < gh) {
      val y0 = r * h / gh
      val y1 = math.max(y0 + 1, (r + 1) * h / gh)
      var c = 0
      while (c < gw) {
        val x0 = c * w / gw
        val x1 = math.max(x0 + 1, (c + 1) * w / gw)
        var sum = 0f
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000f
            x += 1
          }
          y += 1
        }
        out(r * gw + c) = sum / ((y1 - y0) * (x1 - x0))
        c += 1
      }
      r += 1
    }
    out
  }

  /** 64-bit perceptual difference hash (dHash, the standard
    * photo-near-dup fingerprint): decode, reduce to a 9x8 mean-luminance
    * grid, bit (r, c) = 1 iff cell(r, c) < cell(r, c+1) — brightness
    * gradients, which survive rescaling, re-encoding, and small edits.
    * Returns None for null/empty/undecodable bytes — an OUT-OF-BAND
    * failure marker, because 0L is a reachable hash for real images
    * (any row-wise non-increasing gradient, not just uniform fills)
    * and an in-band sentinel would silently drop their true dup pairs. */
  def imageDHash(bytes: Array[Byte]): Option[Long] =
    dHashGrid(bytes).map(hashOfGrid)

  /** The 9x8 luminance grid of a decodable image; None on failure. */
  private def dHashGrid(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None else Some(lumaGrid(img, 9, 8))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def hashOfGrid(g: Array[Float]): Long = {
    var out = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r * 9 + c) < g(r * 9 + c + 1)) out |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    out
  }

  /** (key, dhash, luma) perceptual-hash table — one map-only pass (the
    * image index artifact; write it bucketed and every dedup run reuses
    * it). `dhash`/`luma` are NULL for undecodable payloads. `luma` is
    * the global mean luminance (0-255): dHash is DELIBERATELY
    * brightness-invariant (it hashes gradients), so a pure-white and a
    * pure-black banner share dhash 0 — the luma column is what lets the
    * pair join tell them apart. */
  def dHashTable(df: DataFrame, binCol: String = "content",
                 keyCol: String = "key"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (key, bytes) =>
        dHashGrid(bytes) match { // ONE decode serves both outputs
          case Some(g) =>
            (key, Some(hashOfGrid(g)),
              Some(math.round(g.sum / g.length).toLong))
          case None => (key, None: Option[Long], None: Option[Long])
        }
      })
      .toDF("key", "dhash", "luma")
  }

  /** Image near-duplicate pairs within `maxHamming` bits: band the
    * 64-bit hash into `maxHamming + 1` chunks — by pigeonhole, any pair
    * within the radius agrees EXACTLY on at least one chunk, so a
    * candidate equi-join on (band, chunk) is lossless; an exact
    * bit_count(xor) re-check then prunes false candidates. The same
    * band-join shape as MinHash/SimHash: the shuffle is keyed by band
    * chunk, never image x image, and only (key, hash, luma) rows —
    * never pixels — cross the wire. Output: (key_a, key_b, hamming),
    * a < b.
    *
    * Guards:
    *   - NULL dhash (decode failure — out-of-band, see imageDHash) is
    *     excluded: corrupt payloads are not duplicates of each other.
    *   - `maxLumaDiff` re-check: dHash is brightness-invariant by
    *     construction, so a pure-white and a pure-black banner share
    *     dhash 0 — requiring mean luminance within the tolerance keeps
    *     gradient-identical but tonally different images apart.
    *   - `maxBucket` skew cap (same doctrine as MinHash/span maxDf): a
    *     chunk value shared by more than `maxBucket` images (massive
    *     uniform/boilerplate populations) is dropped from candidate
    *     generation — its pairs are near-degenerate anyway and the cap
    *     bounds per-task join fan-out by maxBucket² regardless of how
    *     pathological the corpus is. */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
                        maxLumaDiff: Long = 16L,
                        maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15, "maxHamming in [0, 15]")
    require(maxBucket >= 2, "maxBucket must be >= 2")
    val bands = maxHamming + 1
    val width = 64 / bands
    // the checkpoint stops the a/b self-join (and the bucket-size agg)
    // from decoding every image twice (typed mapPartitions blocks
    // ReusedExchange — same fix as Fuzzy/Bm25)
    val clean = hashes.filter(col("dhash").isNotNull)
      .localCheckpoint(eager = false)
    val banded = clean.select(col("key"), col("dhash"), col("luma"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("chunk",
        // the last band takes the remainder bits so all 64 are covered
        when(col("band") === bands - 1,
          shiftrightunsigned(col("dhash"), (bands - 1) * width))
          .otherwise(expr(s"shiftrightunsigned(dhash, band * $width)")
            .bitwiseAND(lit((1L << width) - 1))))
    val smallBuckets = banded.groupBy("band", "chunk")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select("band", "chunk")
    val capped = banded.join(smallBuckets, Seq("band", "chunk"), "left_semi")
    val a = capped.select(col("key").as("key_a"), col("dhash").as("ha"),
      col("luma").as("la"), col("band"), col("chunk"))
    val b = capped.select(col("key").as("key_b"), col("dhash").as("hb"),
      col("luma").as("lb"), col("band"), col("chunk"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("key_a") < col("key_b"))
      .filter(abs(col("la") - col("lb")) <= maxLumaDiff)
      .select(col("key_a"), col("key_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
