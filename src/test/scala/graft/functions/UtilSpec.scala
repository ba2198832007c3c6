package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.rdf.NS

/** Mirrors razulibs tests/test_util.py:6-97 — path normalization (STR6)
  * and date_type dispatch (D1). */
class PathsSpec extends AnyFunSuite {

  test("windows path with bestanden")(
    assert(Paths.normalizePath("C:\\Users\\test\\bestanden\\subfolder\\file.txt")
      == "subfolder/file.txt"))
  test("unix path with bestanden")(
    assert(Paths.normalizePath("/home/user/bestanden/subfolder/file.txt")
      == "subfolder/file.txt"))
  test("explicit base dir")(
    assert(Paths.normalizePath("/home/user/project/data/file.txt",
      Some("/home/user/project")) == "data/file.txt"))
  test("explicit base dir windows")(
    assert(Paths.normalizePath("C:\\Users\\test\\project\\data\\file.txt",
      Some("C:\\Users\\test\\project")) == "data/file.txt"))
  test("no bestanden → unchanged")(
    assert(Paths.normalizePath("/home/user/documents/file.txt")
      == "/home/user/documents/file.txt"))
  test("empty after bestanden")(
    assert(Paths.normalizePath("/home/user/bestanden") == ""))
  test("multiple bestanden → after first")(
    assert(Paths.normalizePath("/home/bestanden/user/bestanden/file.txt")
      == "user/bestanden/file.txt"))
  test("base dir not in path → unchanged")(
    assert(Paths.normalizePath("/home/user/project/data/file.txt",
      Some("/different/path")) == "/home/user/project/data/file.txt"))

  test("full extension (STR4)") {
    assert(Paths.fullExtension("archive.tar.gz") == ".tar.gz")
    assert(Paths.fullExtension("file.txt") == ".txt")
    assert(Paths.fullExtension("noext") == "")
    assert(Paths.fullExtension("/a/b/archive.tar.gz") == ".tar.gz")
    assert(Paths.fullExtension(".bashrc") == "")
  }
  test("filename without extensions (STR5)") {
    assert(Paths.filenameWithoutExtensions("archive.tar.gz") == "archive")
    assert(Paths.filenameWithoutExtensions("noext") == "noext")
  }
  test("basename (STR8)") {
    assert(Paths.basename("/a/b/c.txt") == "c.txt")
    assert(Paths.basename("c.txt") == "c.txt")
  }
}

class DateTypesSpec extends AnyFunSuite {
  test("iso date → xsd:date")(
    assert(DateTypes.dateType("2023-12-31") == ("2023-12-31", NS.xsdDate)))
  test("year only → xsd:gYear")(
    assert(DateTypes.dateType("2023") == ("2023", NS.xsdGYear)))
  test("dutch format → reordered xsd:date")(
    assert(DateTypes.dateType("31-12-2023") == ("2023-12-31", NS.xsdDate)))
  test("dutch single digits zero-padded")(
    assert(DateTypes.dateType("1-4-2023") == ("2023-04-01", NS.xsdDate)))
  test("invalid stays untyped")(
    assert(DateTypes.dateType("invalid-date") == ("invalid-date", null)))
  test("partial date stays untyped")(
    assert(DateTypes.dateType("2023-12") == ("2023-12", null)))
}

/** Column variants agree with the pure functions on the pinned cases. */
class UtilColumnSpec extends graft.SparkSuite {
  import org.apache.spark.sql.functions._

  test("normalizePathCol matches normalizePath (bestanden cases)") {
    import spark.implicits._
    val cases = Seq(
      "C:\\Users\\test\\bestanden\\subfolder\\file.txt",
      "/home/user/bestanden/subfolder/file.txt",
      "/home/user/documents/file.txt",
      "/home/user/bestanden",
      "/home/bestanden/user/bestanden/file.txt")
    val out = cases.toDF("p")
      .select(col("p"), Paths.normalizePathCol(col("p")).as("n")).collect()
    out.foreach(r => assert(r.getString(1) == Paths.normalizePath(r.getString(0)),
      s"for ${r.getString(0)}"))
  }

  test("dateValueCol/dateDatatypeCol match dateType") {
    import spark.implicits._
    val cases = Seq("2023-12-31", "2023", "31-12-2023", "1-4-2023",
      "invalid-date", "2023-12")
    val out = cases.toDF("s")
      .select(col("s"), DateTypes.dateValueCol(col("s")).as("v"),
        DateTypes.dateDatatypeCol(col("s")).as("dt")).collect()
    out.foreach { r =>
      val (v, dt) = DateTypes.dateType(r.getString(0))
      assert(r.getString(1) == v, s"value for ${r.getString(0)}")
      assert(Option(r.getString(2)).orNull == dt, s"datatype for ${r.getString(0)}")
    }
  }

  test("fullExtensionCol/filenameWithoutExtensionsCol match pure fns") {
    import spark.implicits._
    val cases = Seq("archive.tar.gz", "file.txt", "noext", ".bashrc")
    val out = cases.toDF("s")
      .select(col("s"), Paths.fullExtensionCol(col("s")).as("e"),
        Paths.filenameWithoutExtensionsCol(col("s")).as("w")).collect()
    out.foreach { r =>
      assert(r.getString(1) == Paths.fullExtension(r.getString(0)), r.getString(0))
      assert(r.getString(2) == Paths.filenameWithoutExtensions(r.getString(0)), r.getString(0))
    }
  }
}
