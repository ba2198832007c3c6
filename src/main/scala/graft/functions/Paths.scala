package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Path / filename scalar ops STR4-STR6, STR8 — semantics pinned by the
  * reference (razu/util.py:32-53,109-153; tests/test_util.py:6-55).
  * Each exists as a pure Scala function and as a Column expression.
  */
object Paths {

  // ---- STR4: full multi-part extension (".tar.gz") ---------------------
  // Mirrors the iterated os.path.splitext loop (razu/util.py:32-53):
  // splitext splits at the LAST dot, but never inside a leading-dot run,
  // so the full extension is everything from the first dot that follows at
  // least one non-dot character in the basename.
  def fullExtension(filename: String): String = {
    val base = filename.substring(filename.lastIndexOf('/') + 1)
    val firstNonDot = base.indexWhere(_ != '.')
    if (firstNonDot < 0) return "" // all dots
    val dot = base.indexOf('.', firstNonDot)
    if (dot < 0) "" else base.substring(dot)
  }

  def fullExtensionCol(name: Column): Column =
    regexp_extract(element_at(split(name, "/"), -1), "^\\.*[^.][^.]*?(\\..*)$", 1)

  // ---- STR5: filename without any extension ----------------------------
  // Everything before the FIRST dot (razu/util.py:109-126): "a.tar.gz"->"a",
  // ".bashrc"->"".
  def filenameWithoutExtensions(filename: String): String = {
    val dot = filename.indexOf('.')
    if (dot < 0) filename else filename.substring(0, dot)
  }

  def filenameWithoutExtensionsCol(name: Column): Column =
    substring_index(name, ".", 1)

  // ---- STR8: basename --------------------------------------------------
  def basename(path: String): String = path.substring(path.lastIndexOf('/') + 1)

  def basenameCol(path: Column): Column = element_at(split(path, "/"), -1)

  // ---- STR6: path normalization ---------------------------------------
  // razu/util.py:128-153 (tests/test_util.py:6-55): backslashes -> '/',
  // strip base_dir if given and matching; else take everything after the
  // FIRST 'bestanden' path segment; else return the slash-normalized path.
  def normalizePath(filePath: String, baseDir: Option[String] = None): String = {
    val p = filePath.replace('\\', '/')
    baseDir.map(_.replace('\\', '/')) match {
      case Some(b) if p.startsWith(b) => p.substring(b.length).dropWhile(_ == '/')
      case _ =>
        val parts = p.split("/", -1)
        val idx = parts.indexOf("bestanden")
        if (idx >= 0) parts.drop(idx + 1).mkString("/") else p
    }
  }

  /** Column variant of the 'bestanden'-relative normalization (the common
    * data-plane case; explicit base-dir stripping is a plain
    * regexp_replace at the call site).
    */
  def normalizePathCol(path: Column): Column = {
    val slashed = regexp_replace(path, "\\\\", "/")
    // after the first '/bestanden/' segment boundary (or leading 'bestanden/')
    when(slashed.rlike("(^|/)bestanden(/|$)"),
      regexp_extract(slashed, "(?:^|/)bestanden(?:/(.*))?$", 1))
      .otherwise(slashed)
  }
}
