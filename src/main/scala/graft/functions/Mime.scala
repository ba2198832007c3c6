package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** STR10 — MIME type guess from a key/filename (razu/s3storage.py:166-169
  * `mimetypes.guess_type` with `application/octet-stream` default) and
  * STR13 — application-signature parsing (razu/application_registry.py:38-58).
  * Plus S13 — line-oriented text log read (logs/compare_manifest_to_s3.py:6-11).
  */
object Mime {

  /** The extension→MIME table for the types the reference's archive flows
    * actually move (images, metadata, common documents). */
  val byExtension: Map[String, String] = Map(
    "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "png" -> "image/png",
    "tif" -> "image/tiff", "tiff" -> "image/tiff", "gif" -> "image/gif",
    "json" -> "application/json", "xml" -> "application/xml",
    "pdf" -> "application/pdf", "txt" -> "text/plain",
    "csv" -> "text/csv", "html" -> "text/html", "ttl" -> "text/turtle",
    "gz" -> "application/gzip", "zip" -> "application/zip",
    "mp4" -> "video/mp4", "mp3" -> "audio/mpeg", "wav" -> "audio/x-wav")

  val default = "application/octet-stream"

  def guess(key: String): String = {
    val dot = key.lastIndexOf('.')
    if (dot < 0) default
    else byExtension.getOrElse(
      key.substring(dot + 1).toLowerCase(java.util.Locale.ROOT), default)
  }

  /** Column variant: chained map lookup on the lowercased last extension
    * (codegen'd CaseWhen — no UDF). */
  def guessCol(key: Column): Column = {
    val ext = lower(element_at(split(key, "\\."), -1))
    byExtension.foldLeft(lit(default)) { case (acc, (e, m)) =>
      when(ext === e && key.contains("."), lit(m)).otherwise(acc)
    }
  }
}

/** STR13 — tool signature parsing (driver-side, like the reference). */
object AppSignature {
  private val VersionRe = "Version:\\s+(\\S+)".r

  /** "Version:   1.2.3" style tool output → version string. */
  def parseVersion(output: String): Option[String] =
    VersionRe.findFirstMatchIn(output).map(_.group(1))

  /** id slug: strip everything but [a-zA-Z0-9_]. */
  def idSlug(name: String): String = name.replaceAll("[^a-zA-Z0-9_]", "")
}

/** S13 — line-oriented text log read: strip + drop blanks. */
object TextLog {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(trim(col("value")).as("line"))
      .filter(length(col("line")) > 0)
}
