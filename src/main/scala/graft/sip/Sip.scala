package graft.sip

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.events.Events
import graft.ids.Identifiers
import graft.manifest.Manifest
import graft.rdf.{Build, NS, Triple}
import graft.rdf.io.JsonLd

/** SIP packaging module — the E2 lifecycle (razu/sip.py) as DataFrame
  * jobs over the triple model:
  *
  *   save:  resources (triples) → one JSON-LD file per root resource (K1)
  *          → manifest from the written tree (S6+H1+K3)
  *          → PREMIS metadata-modification events (K4)
  *   load:  directory of *.meta.json (S5/S3/S4) → triple DF with ids
  *          re-derived from filenames (STR3)
  *
  * The reference's deferred event queue disappears: event subjects are
  * derived from the saved-resources DF in ordinary dependency order
  * (SURVEY §3 E2 — "the queue disappears").
  */
object Sip {

  /** K1 — write one JSON-LD file per root resource:
    * <uid>.meta.json named via the id algebra. Files are written
    * per-partition (distributed), not via a driver loop like
    * csv2rdf.py:234-237's per-row save, through the Hadoop FileSystem
    * API so a SIP directory can live on any scheme (file://, hdfs://,
    * s3a://) exactly like [[graft.store.HadoopFsStore]]. Returns
    * (root, filename). */
  def saveResources(triples: DataFrame, dir: String,
                    ids: Identifiers = Identifiers.default): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = new HPath(dir)
    base.getFileSystem(new org.apache.hadoop.conf.Configuration()).mkdirs(base)
    val docs = JsonLd.documents(triples)
      .withColumn("id", ids.extractIdCol(col("root")))
      .withColumn("filename", ids.filenameCol(col("id")))
    docs.select("filename", "json").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val fs = new HPath(dir)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
        it.foreach { r =>
          val out = fs.create(new HPath(dir + "/" + r.getString(0)), true)
          try out.write(r.getString(1).getBytes("UTF-8")) finally out.close()
        }
    }
    docs.select("root", "filename")
  }

  /** S5 — load a SIP directory: every *.meta.json parsed to triples with
    * per-file bnode isolation; object ids re-derived from file names. */
  def loadResources(spark: SparkSession, dir: String,
                    ids: Identifiers = Identifiers.default): DataFrame =
    JsonLd.read(spark, s"$dir/*.meta.json")

  /** STR3/W2 — recover the highest object id from a SIP directory's
    * file names (sip.py:186-203 re-derives ids on load_existing so the
    * Incrementer can continue). 0 for an empty/missing directory.
    * Hadoop FileSystem listing — works on any scheme. */
  def maxResourceId(spark: SparkSession, dir: String,
                    ids: Identifiers = Identifiers.default): Long = {
    import org.apache.hadoop.fs.{Path => HPath}
    val p = new HPath(dir)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) return 0L
    val names = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(s".${ids.cfg.metadataSuffix}.${ids.cfg.metadataExtension}"))
    if (names.isEmpty) 0L
    else names.flatMap(n => scala.util.Try(
      ids.extractIdFromFilename(n).toLong).toOption).foldLeft(0L)(math.max)
  }

  /** Full save lifecycle (sip.py:173-180): resources → files → manifest →
    * events → eventlog. Returns the manifest DataFrame. */
  def save(spark: SparkSession, triples: DataFrame, dir: String,
           ids: Identifiers = Identifiers.default,
           timestamp: String = java.time.Instant.now().toString): DataFrame = {
    val written = saveResources(triples, dir, ids)
    spark.catalog.refreshByPath(dir)

    // manifest over the written tree (K3); the manifest/eventlog files
    // themselves stay out (F13)
    val manifest = Manifest.scanDirectory(spark, dir,
      ignore = Seq(ids.manifestFilename, ids.eventlogFilename))
    Manifest.saveJson(manifest, s"$dir/${ids.manifestFilename}")

    // one metadata-modification (mem) event per written resource
    // (sip.py:147-155: description + prov:generated = the metadata file)
    val events = Events.emit(written, Seq(col("root")), Events.mem,
      subjectOf = col("root"), outcome = lit(true),
      description = lit("Metadata object created."),
      generated = ids.metadataFileUriCol(ids.extractIdCol(col("root"))),
      timestamp = timestamp, ids = ids)
    saveEventlog(events, dir, ids)
    manifest
  }

  /** K4 — eventlog sink: the reference's single `<uid>.eventlog.json`
    * JSON array (preservation_events.py:61-68), written WITHOUT collecting
    * documents to the driver: docs stream through one executor task
    * (coalesce(1) + partition-local sort for a deterministic doc order)
    * into a temp dir, and the part file is renamed into place. A single
    * parity file is inherently one writer; for event graphs too large for
    * one file, use `Events.save` (partitioned JSON-LD) instead.
    */
  def saveEventlog(events: DataFrame, dir: String,
                   ids: Identifiers = Identifiers.default): Unit = {
    val spark = events.sparkSession
    import spark.implicits._
    // URI-safe join (java.nio Paths.get would collapse a scheme's '//')
    val tmp = graft.sources.FsUtil.child(dir, s".${ids.eventlogFilename}.tmp")
    val lines = JsonLd.documents(events)
      .select("root", "json").as[(String, String)]
      .coalesce(1).sortWithinPartitions("root")
      .mapPartitions { it =>
        // stream the JSON array shape: "[", doc "," ... doc, "]"
        var prev: String = null
        val body = it.map { case (_, json) =>
          val out = if (prev == null) "[" else prev + ","
          prev = json
          out
        }
        val tail = Iterator.single(()).flatMap { _ =>
          if (prev == null) Iterator.single("[") ++ Iterator.single("]")
          else Iterator.single(prev) ++ Iterator.single("]")
        }
        body ++ tail
      }
    lines.write.mode("overwrite").text(tmp)
    graft.sources.FsUtil.promotePartFile(tmp,
      graft.sources.FsUtil.child(dir, ids.eventlogFilename),
      emptyFallback = Some("[]"))
  }
}
