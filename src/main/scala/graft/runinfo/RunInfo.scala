package graft.runinfo

import java.nio.file.{Files, Paths}

/** S9 — per-tool run info `{name, uri, start_time, end_time, result}`
  * persisted as one small JSON file (razu/run_info.py:8-62). Driver-side
  * metadata, not a Spark job. */
final case class RunInfo(name: String, uri: String,
                         startTime: String, endTime: String,
                         result: String = "") {
  def toJson: String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"name": ${q(name)}, "uri": ${q(uri)}, "start_time": ${q(startTime)}, "end_time": ${q(endTime)}, "result": ${q(result)}}"""
  }
  def save(path: String): Unit = Files.writeString(Paths.get(path), toJson)
}

object RunInfo {
  private val Field = """"(\w+)":\s*"((?:[^"\\]|\\.)*)"""".r

  def parse(json: String): RunInfo = {
    val m = Field.findAllMatchIn(json)
      .map(x => x.group(1) -> x.group(2).replace("\\\"", "\"").replace("\\\\", "\\"))
      .toMap
    RunInfo(m.getOrElse("name", ""), m.getOrElse("uri", ""),
      m.getOrElse("start_time", ""), m.getOrElse("end_time", ""),
      m.getOrElse("result", ""))
  }

  def load(path: String): RunInfo = parse(Files.readString(Paths.get(path)))

  /** A5 — earliest of two tool start times (razu/sip.py:79-81): ISO-string
    * min, exactly the reference's semantics. */
  def earliestStart(a: RunInfo, b: RunInfo): String =
    if (a.startTime <= b.startTime) a.startTime else b.startTime
}
