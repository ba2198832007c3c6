package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, plus
  * batch-shaped decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The decode kernels are STUBS (this container ships no image/audio
  * codecs): `decodeStub` derives a deterministic fake decode from the
  * bytes themselves, so every piece of Spark-side plumbing — schema,
  * partitioning, batch iteration shape, null/corrupt handling — is real
  * and tested, and swapping in a real codec changes one function.
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

  /** Deterministic stand-in for a real image decode: dimensions and an
    * n-dim feature vector derived from the byte content. Replace the body
    * with a codec call (e.g. TwelveMonkeys/javax.imageio) to go real —
    * the signature and the partition-batch shape stay. */
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
    * per partition (the mapInPandas batch shape). */
  def decodeImages(df: DataFrame, binCol: String = "content",
                   keyCol: String = "key", featureDim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would open the codec ONCE here
        it.map { case (key, bytes) =>
          val (w, h, c, f) = decodeStub(bytes, featureDim)
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
}
