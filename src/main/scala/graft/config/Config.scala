package graft.config

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** S14 — configuration: flat-YAML key/value load with search-path
  * discovery and write-once semantics (razu/config.py:16-59, 74-154;
  * pinned by tests/test_config.py:17-61).
  *
  * Driver-side concern, not a Spark one (SURVEY §1.1 #9). The reference
  * uses yaml.safe_load on flat scalar maps only — this parser supports
  * exactly that subset (key: value, comments, blank lines, quoted
  * strings); nesting is out of scope by construction.
  */
final class Config private (values: Map[String, String]) {

  /** Attribute access; AttributeError equivalent = NoSuchElementException. */
  def apply(key: String): String =
    values.getOrElse(key,
      throw new NoSuchElementException(s"no configuration setting '$key'"))

  def get(key: String): Option[String] = values.get(key)
  def keys: Set[String] = values.keySet

  /** Write-once: adding a NEW key yields a new Config; overwriting an
    * existing key is refused (razu/config.py:144-147). */
  def withSetting(key: String, value: String): Config = {
    require(!values.contains(key),
      s"configuration setting '$key' is write-once and already set")
    new Config(values + (key -> value))
  }

  def toIdConfig: graft.ids.IdConfig = graft.ids.IdConfig(
    razuFileId = apply("razu_file_id"),
    archiveCreatorId = values.getOrElse("archive_creator_id", "G0321"),
    archiveId = values.getOrElse("archive_id", "661"),
    razuBaseUri = apply("razu_base_uri"),
    resourceIdentifierSegment = apply("resource_identifier_segment"),
    storageBaseDomain = apply("storage_base_domain"),
    metadataSuffix = apply("metadata_suffix"),
    manifestSuffix = apply("manifest_suffix"),
    eventlogSuffix = apply("eventlog_suffix"),
    metadataExtension = apply("metadata_extension"))
}

object Config {

  @volatile private var instance: Option[Config] = None

  /** Flat-YAML parse: `key: value` lines, '#' comments, quotes stripped. */
  def parse(text: String): Map[String, String] =
    text.linesIterator
      .map(_.takeWhile(_ != '#'))
      .map(_.trim)
      .filter(l => l.nonEmpty && l.contains(':'))
      .map { l =>
        val i = l.indexOf(':')
        val k = l.substring(0, i).trim
        val v = l.substring(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
        k -> v
      }
      .toMap

  /** Search-path discovery (razu/config.py:16-59): explicit file, else
    * ./razu.yaml, else ~/.razu.yaml. */
  def locate(explicit: Option[String] = None): Option[Path] = {
    val candidates = explicit.map(Paths.get(_)).toSeq ++ Seq(
      Paths.get("razu.yaml"),
      Paths.get(sys.props.getOrElse("user.home", "."), ".razu.yaml"))
    candidates.find(Files.exists(_))
  }

  /** Singleton initialize-from-file (razu/config.py:96-106). */
  def initialize(configFile: String): Config = synchronized {
    val cfg = new Config(parse(Files.readString(Paths.get(configFile))))
    instance = Some(cfg)
    cfg
  }

  def getInstance: Config = instance.getOrElse(
    throw new IllegalStateException("Config not initialized"))

  def reset(): Unit = synchronized { instance = None }
}
