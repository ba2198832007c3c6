package graft.ids

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Static configuration for the identifier algebra — the subset of the
  * reference's YAML config (razu/config.py:74-154) that id derivation
  * consumes (razu/identifiers.py:11-86). Plain case class: config is a
  * driver-side concern, not a Spark one (SURVEY §1.1 #9).
  */
final case class IdConfig(
    razuFileId: String = "NL-WbDRAZU",
    archiveCreatorId: String = "G0321",
    archiveId: String = "661",
    razuBaseUri: String = "https://data.razu.nl/",
    resourceIdentifierSegment: String = "id",
    storageBaseDomain: String = "opslag.razu.nl",
    metadataSuffix: String = "meta",
    manifestSuffix: String = "manifest",
    eventlogSuffix: String = "eventlog",
    metadataExtension: String = "json")

/** Identifier algebra: integer id → uid → uri → filename → storage key,
  * and the inverse extractions. Each derivation exists twice: as a pure
  * Scala function (driver-side, unit-testable against the reference's
  * pinned expectations, razulibs tests/test_identifiers.py:22-101) and as
  * a `Column` expression (data-plane, codegen'd — no UDFs).
  *
  * Semantics from razu/identifiers.py:11-121.
  */
final class Identifiers(val cfg: IdConfig) extends Serializable {

  // ---- pure functions -------------------------------------------------

  /** e.g. "NL-WbDRAZU-G0321-661" (razu/identifiers.py:12-20) */
  val uidBase: String = s"${cfg.razuFileId}-${cfg.archiveCreatorId}-${cfg.archiveId}"

  /** e.g. "https://g0321.opslag.razu.nl/" (razu/identifiers.py:23-28).
    * Locale.ROOT: default-locale lowercasing would corrupt the host for
    * e.g. Turkish 'I'. */
  val cdnBaseUri: String =
    s"https://${cfg.archiveCreatorId.toLowerCase(java.util.Locale.ROOT)}.${cfg.storageBaseDomain}/"

  /** e.g. "https://data.razu.nl/id/object/NL-WbDRAZU-G0321-661"
    * (razu/identifiers.py:53-60) */
  def uriPrefixForKind(kind: String): String =
    s"${cfg.razuBaseUri}${cfg.resourceIdentifierSegment}/$kind/$uidBase"

  def objectUriPrefix: String = uriPrefixForKind("object")
  def eventUriPrefix: String = uriPrefixForKind("event")

  /** "NL-WbDRAZU-G0321-661.manifest.json" (razu/identifiers.py:41-44) */
  def manifestFilename: String =
    s"$uidBase.${cfg.manifestSuffix}.${cfg.metadataExtension}"

  /** "NL-WbDRAZU-G0321-661.eventlog.json" (razu/identifiers.py:46-49) */
  def eventlogFilename: String =
    s"$uidBase.${cfg.eventlogSuffix}.${cfg.metadataExtension}"

  /** uid from object id: "NL-WbDRAZU-G0321-661-42" (razu/identifiers.py:62-64) */
  def uidFromId(id: String): String = s"$uidBase-$id"

  /** "https://g0321.opslag.razu.nl/<uid>.<ext>" (razu/identifiers.py:50-52) */
  def cdnUriFromUidExtension(uid: String, ext: String): String =
    s"$cdnBaseUri$uid.$ext"

  /** object URI from id (razu/identifiers.py:66-69) */
  def uriFromId(id: String): String = uriFromKindUid("object", uidFromId(id))

  def uriFromKindUid(kind: String, uid: String): String =
    s"${cfg.razuBaseUri}${cfg.resourceIdentifierSegment}/$kind/$uid"

  /** "<uidBase>-42.meta.json" (razu/identifiers.py:75-77) */
  def filenameFromId(id: String): String =
    s"$uidBase-$id.${cfg.metadataSuffix}.${cfg.metadataExtension}"

  /** Storage path bucketing: id 1_234_567 → "NL-WbDRAZU/G0321/661/001/234/"
    * — div/mod bucketing keeps ≤1000 objects per prefix
    * (razu/identifiers.py:79-86, SURVEY §2.10 STR2). */
  def storagePathFromId(id: Long): String = {
    require(id >= 0, s"storage paths are defined for non-negative ids, got $id")
    val millions = id / 1000000L
    val thousands = id % 1000000L / 1000L
    f"${cfg.razuFileId}/${cfg.archiveCreatorId}/${cfg.archiveId}/$millions%03d/$thousands%03d/"
  }

  /** inverse: ".../<uidBase>-<id>.meta.json" → id (razu/identifiers.py:88-91).
    * Config-derived fragments are regex-quoted — the reference uses literal
    * str.split, so a dot or dash in config must not act as a metacharacter. */
  def extractIdFromIdentifier(identifier: String): String = {
    import java.util.regex.Pattern
    identifier.split(Pattern.quote(s"$uidBase-"))(1)
      .split(Pattern.quote(s".${cfg.metadataSuffix}.${cfg.metadataExtension}"))(0)
  }

  /** positional part extraction after razuFileId (razu/identifiers.py:107-121):
    * part 1 = source/creator id, 2 = archive id, 3 = object id. */
  def extractPartFromFilename(filename: String, partNumber: Int): String = {
    val found = filename.indexOf(cfg.razuFileId)
    require(found >= 0, s"razu file ID '${cfg.razuFileId}' not found in '$filename'")
    var start = found + cfg.razuFileId.length + 1
    var i = 0
    while (i < partNumber - 1) {
      start = filename.indexOf('-', start) + 1
      require(start != 0, s"Part $partNumber not found in '$filename'")
      i += 1
    }
    val end = filename.indexOf('-', start)
    if (end == -1) filename.substring(start) else filename.substring(start, end)
  }

  def extractSourceIdFromFilename(f: String): String = extractPartFromFilename(f, 1)
  def extractArchiveIdFromFilename(f: String): String = extractPartFromFilename(f, 2)
  def extractIdFromFilename(f: String): String =
    extractPartFromFilename(f, 3).split('.')(0)
  def extractIdFromFilePath(p: String): String =
    extractIdFromFilename(p.split('/').last)

  // ---- Column expressions (data plane, codegen'd) ---------------------

  /** uid column from an id column. */
  def uidCol(id: Column): Column = concat(lit(uidBase + "-"), id.cast("string"))

  /** object (or other kind) URI column from an id column. */
  def uriCol(id: Column, kind: String = "object"): Column =
    concat(lit(s"${cfg.razuBaseUri}${cfg.resourceIdentifierSegment}/$kind/$uidBase-"),
      id.cast("string"))

  /** metadata filename column from an id column. */
  def filenameCol(id: Column): Column =
    concat(lit(uidBase + "-"), id.cast("string"),
      lit(s".${cfg.metadataSuffix}.${cfg.metadataExtension}"))

  /** CDN URI column. */
  def cdnUriCol(uid: Column, ext: Column): Column =
    concat(lit(cdnBaseUri), uid, lit("."), ext)

  /** S3-style bucketed storage path column (STR2). Integer `div` (not
    * double `/`) keeps exactness above 2^53, and the id is required
    * non-negative like the driver-side variant so both halves of the
    * algebra agree. */
  def storagePathCol(id: Column): Column =
    format_string(
      s"${cfg.razuFileId}/${cfg.archiveCreatorId}/${cfg.archiveId}/%03d/%03d/",
      call_function("div", id.cast("long"), lit(1000000L)),
      call_function("div", pmod(id.cast("long"), lit(1000000L)), lit(1000L)))

  /** inverse extraction column: object id out of a filename/uri/path. */
  def extractIdCol(identifier: Column): Column =
    regexp_extract(identifier, s"\\Q$uidBase\\E-([^-.]+)", 1)

  /** metadata-file URI column: cdn base + bucketed storage path +
    * <uid>.meta.json (razu/meta_resource.py:108-110 metadata_file_uri).
    * The reference buckets with `int(id)`; ids with a non-numeric suffix
    * (e.g. the flagship's "35b" bestand variant) bucket by their numeric
    * prefix instead of failing the ANSI cast. */
  def metadataFileUriCol(id: Column): Column = {
    val digits = regexp_extract(id.cast("string"), "^(\\d+)", 1)
    val bucket = when(length(digits) > 0, digits.cast("long")).otherwise(lit(0L))
    concat(lit(cdnBaseUri), storagePathCol(bucket), filenameCol(id))
  }
}

object Identifiers {
  val default: Identifiers = new Identifiers(IdConfig())
}
