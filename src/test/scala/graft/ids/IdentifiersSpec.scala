package graft.ids

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Mirrors the reference's pinned expectations
  * (razulibs tests/test_identifiers.py:22-101) plus round-trip properties.
  */
class IdentifiersSpec extends AnyFunSuite {
  private val ids = Identifiers.default

  test("uid base")(assert(ids.uidBase == "NL-WbDRAZU-G0321-661"))
  test("cdn base uri")(assert(ids.cdnBaseUri == "https://g0321.opslag.razu.nl/"))
  test("object uri prefix")(
    assert(ids.objectUriPrefix == "https://data.razu.nl/id/object/NL-WbDRAZU-G0321-661"))
  test("event uri prefix")(
    assert(ids.eventUriPrefix == "https://data.razu.nl/id/event/NL-WbDRAZU-G0321-661"))
  test("manifest filename")(
    assert(ids.manifestFilename == "NL-WbDRAZU-G0321-661.manifest.json"))
  test("eventlog filename")(
    assert(ids.eventlogFilename == "NL-WbDRAZU-G0321-661.eventlog.json"))
  test("cdn uri from uid+extension")(
    assert(ids.cdnUriFromUidExtension("NL-WbDRAZU-G0321-661-42", "jpg")
      == "https://g0321.opslag.razu.nl/NL-WbDRAZU-G0321-661-42.jpg"))
  test("uri prefix from kind")(
    assert(ids.uriPrefixForKind("concept")
      == "https://data.razu.nl/id/concept/NL-WbDRAZU-G0321-661"))
  test("uid from id")(
    assert(ids.uidFromId("42") == "NL-WbDRAZU-G0321-661-42"))
  test("uri from id")(
    assert(ids.uriFromId("42")
      == "https://data.razu.nl/id/object/NL-WbDRAZU-G0321-661-42"))
  test("uri from kind+uid")(
    assert(ids.uriFromKindUid("resource", "NL-WbDRAZU-G0321-661-42")
      == "https://data.razu.nl/id/resource/NL-WbDRAZU-G0321-661-42"))
  test("filename from id")(
    assert(ids.filenameFromId("42") == "NL-WbDRAZU-G0321-661-42.meta.json"))
  test("extract id from identifier")(
    assert(ids.extractIdFromIdentifier("NL-WbDRAZU-G0321-661-42.meta.json") == "42"))
  test("extract parts from filename") {
    val f = "NL-WbDRAZU-G0321-661-42.meta.json"
    assert(ids.extractSourceIdFromFilename(f) == "G0321")
    assert(ids.extractArchiveIdFromFilename(f) == "661")
    assert(ids.extractIdFromFilename(f) == "42")
  }
  test("extract id from file path")(
    assert(ids.extractIdFromFilePath("/some/path/to/NL-WbDRAZU-G0321-661-42.meta.json") == "42"))

  test("storage path bucketing (STR2)") {
    assert(ids.storagePathFromId(1234567L) == "NL-WbDRAZU/G0321/661/001/234/")
    assert(ids.storagePathFromId(0L) == "NL-WbDRAZU/G0321/661/000/000/")
    assert(ids.storagePathFromId(999L) == "NL-WbDRAZU/G0321/661/000/000/")
    assert(ids.storagePathFromId(1000L) == "NL-WbDRAZU/G0321/661/000/001/")
  }

  test("property: id → filename → id round-trip") {
    val prop = Prop.forAll(Gen.choose(0L, 1000000000L)) { (n: Long) =>
      ids.extractIdFromFilename(ids.filenameFromId(n.toString)) == n.toString &&
      ids.extractIdFromIdentifier(ids.filenameFromId(n.toString)) == n.toString
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}

/** Column-expression variants agree with the pure functions. */
class IdentifiersColumnSpec extends graft.SparkSuite {
  import org.apache.spark.sql.functions._

  private val ids = Identifiers.default

  test("Column id algebra matches driver-side algebra") {
    import spark.implicits._
    val df = Seq(0L, 42L, 999L, 1000L, 1234567L, 999999999L).toDF("id")
      .select(col("id"),
        ids.uidCol(col("id")).as("uid"),
        ids.uriCol(col("id")).as("uri"),
        ids.filenameCol(col("id")).as("fn"),
        ids.storagePathCol(col("id")).as("sp"))
    df.collect().foreach { r =>
      val id = r.getLong(0).toString
      assert(r.getString(1) == ids.uidFromId(id))
      assert(r.getString(2) == ids.uriFromId(id))
      assert(r.getString(3) == ids.filenameFromId(id))
      assert(r.getString(4) == ids.storagePathFromId(r.getLong(0)))
    }
  }

  test("extractIdCol inverts filenameCol") {
    import spark.implicits._
    val df = Seq(1L, 42L, 31337L).toDF("id")
      .select(col("id"), ids.extractIdCol(ids.filenameCol(col("id"))).as("back"))
    df.collect().foreach(r => assert(r.getString(1) == r.getLong(0).toString))
  }
}
