package graft.store

import java.nio.file.{Files, Paths => JPaths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Object-store sink module (K5–K10) — razu/edepot.py + razu/s3storage.py
  * re-expressed as manifest-driven DataFrame programs over a pluggable
  * store. The test environment is zero-egress, so the shipped
  * implementation targets a local filesystem root; the flows (filter →
  * anti-join → foreachPartition side effects → verify) are the S3 shapes:
  * swap `LocalFsStore` for an S3 client per partition and nothing else
  * changes.
  *
  * Scale notes: uploads/deletes run per partition with counters as
  * accumulators (A4), skip-existing is a LISTING ANTI-JOIN (J5/F9) — the
  * reference's per-object HEAD round-trip (edepot.py:137-142) and
  * driver-side checksum dict (edepot.py:98-105) both become joins.
  * Deletes batch 1000 keys per call (K8, edepot.py:216-228) and verify by
  * re-list + anti-join. All side effects are idempotent by key, so Spark
  * task retries are safe (SURVEY §7 risk 7).
  */
trait ObjectStore extends Serializable {
  def put(key: String, content: Array[Byte], metadata: Map[String, String]): Unit
  def delete(keys: Seq[String]): Unit
  def setAcl(key: String, acl: String): Unit
}

/** Local-FS store rooted at `root`; metadata/ACLs ride as sidecar files
  * (the S3 user-metadata analogue). */
final class LocalFsStore(root: String) extends ObjectStore {
  private def resolve(key: String) = {
    val p = JPaths.get(root, key)
    Files.createDirectories(p.getParent)
    p
  }
  override def put(key: String, content: Array[Byte],
                   metadata: Map[String, String]): Unit = {
    Files.write(resolve(key), content)
    if (metadata.nonEmpty) {
      // URL-encoded like S3 user metadata (STR9, s3storage.py:480-493)
      val enc = metadata.toSeq.sortBy(_._1).map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("\n")
      Files.writeString(resolve(key + ".meta"), enc)
    }
  }
  override def delete(keys: Seq[String]): Unit =
    keys.foreach { k =>
      Files.deleteIfExists(JPaths.get(root, k))
      Files.deleteIfExists(JPaths.get(root, k + ".meta"))
    }
  override def setAcl(key: String, acl: String): Unit =
    Files.writeString(resolve(key + ".acl"), acl)
}

object Store {

  /** S10 — listing of the store as a DataFrame of keys (+ etag = md5).
    * The local analogue of the paginated bucket listing
    * (s3storage.py:289-309). */
  def listing(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    if (!Files.exists(JPaths.get(root)))
      return Seq.empty[(String, String)].toDF("key", "etag")
    spark.read.format("binaryFile").option("recursiveFileLookup", "true")
      .load(root)
      .filter(!col("path").endsWith(".meta") && !col("path").endsWith(".acl"))
      .select(
        expr(s"substring(regexp_replace(path, '^file:', ''), ${root.stripSuffix("/").length + 2})")
          .as("key"),
        md5(col("content")).as("etag"))
  }

  /** K5/K6 — manifest-driven bulk upload: rows of
    * (key, content: binary, metadata: map<string,string>) are written per
    * partition; `onlyIfNew` anti-joins the current listing first (F9/J5).
    * Returns (uploaded, skipped) via accumulators. */
  def upload(files: DataFrame, store: ObjectStore, spark: SparkSession,
             onlyIfNew: Boolean = false,
             existing: Option[DataFrame] = None): (Long, Long) = {
    val uploaded: LongAccumulator = spark.sparkContext.longAccumulator("uploaded")
    val total = files.count()
    val toSend =
      if (onlyIfNew && existing.nonEmpty)
        files.join(existing.get.select(col("key")), Seq("key"), "left_anti")
      else files
    val hasMeta = toSend.columns.contains("metadata")
    toSend.select(col("key"), col("content"),
        if (hasMeta) col("metadata")
        else map().cast("map<string,string>").as("metadata"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val md = Option(r.getMap[String, String](2))
            .map(_.toMap).getOrElse(Map.empty)
          store.put(r.getString(0), r.getAs[Array[Byte]](1), md)
          uploaded.add(1)
        }
      }
    (uploaded.value, total - uploaded.value)
  }

  /** K8 — batched delete (1000 keys per call, edepot.py:216-228), then
    * verify by re-list anti-join; returns keys that survived deletion. */
  def deleteByKeys(keys: DataFrame, store: ObjectStore, spark: SparkSession,
                   root: String, batchSize: Int = 1000): DataFrame = {
    keys.select("key").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.map(_.getString(0)).grouped(batchSize)
          .foreach(batch => store.delete(batch.toSeq))
    }
    spark.catalog.refreshByPath(root)
    keys.select("key").join(listing(spark, root), Seq("key"), "left_semi")
  }

  /** K9 — ACL update for every manifest key (edepot.py:271-304). */
  def updateAcls(keys: DataFrame, store: ObjectStore, acl: String): Unit =
    keys.select("key").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach(r => store.setAcl(r.getString(0), acl))
    }

  /** H2 — upload verification: manifest md5 vs listing etag
    * (s3storage.py:219-255, single-part semantics). Returns rows with a
    * boolean `verified`. */
  def verifyUploads(manifest: DataFrame, listing: DataFrame): DataFrame =
    manifest.join(listing, Seq("key"), "left_outer")
      .withColumn("verified",
        col("etag").isNotNull && col("etag") === col("md5hash"))

  /** K10 — diagnostic key-list text sink (edepot.py:174-196). */
  def writeKeyList(keys: DataFrame, path: String): Unit =
    keys.select("key").orderBy("key")
      .coalesce(1).write.mode("overwrite").text(path)
}
