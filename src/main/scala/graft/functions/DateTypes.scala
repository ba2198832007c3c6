package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.rdf.NS

/** D1 `date_type` dispatch — classifies a date string and normalizes it,
  * mirroring the reference's behavior (razu/util.py:9-30, pinned by
  * tests/test_util.py:57-97):
  *
  *   - "yyyy-mm-dd"            -> (same,        xsd:date)
  *   - "yyyy"                  -> (same,        xsd:gYear)
  *   - "d-m-yyyy" (1-2 digits) -> ("yyyy-mm-dd", xsd:date)  [Dutch order]
  *   - anything else           -> (same,        null)       [untyped literal]
  *
  * Exists as a pure Scala function (driver-side / tests) and as a codegen'd
  * Column expression (chained `when` + regexp — no UDF).
  */
object DateTypes {

  private val IsoRe = "^\\d{4}-\\d{2}-\\d{2}$".r
  private val YearRe = "^\\d{4}$".r
  private val DmyRe = "^(\\d{1,2})-(\\d{1,2})-(\\d{4})$".r

  /** (normalizedValue, datatypeIri-or-null) */
  def dateType(s: String): (String, String) = s match {
    case IsoRe() => (s, NS.xsdDate)
    case YearRe() => (s, NS.xsdGYear)
    case DmyRe(d, m, y) => (f"$y-${m.toInt}%02d-${d.toInt}%02d", NS.xsdDate)
    case _ => (s, null)
  }

  private val isoPat = "^\\d{4}-\\d{2}-\\d{2}$"
  private val yearPat = "^\\d{4}$"
  private val dmyPat = "^(\\d{1,2})-(\\d{1,2})-(\\d{4})$"

  /** Normalized lexical value column. */
  def dateValueCol(s: Column): Column =
    when(s.rlike(dmyPat),
      format_string("%s-%02d-%02d",
        regexp_extract(s, dmyPat, 3),
        regexp_extract(s, dmyPat, 2).cast("int"),
        regexp_extract(s, dmyPat, 1).cast("int")))
      .otherwise(s)

  /** Datatype IRI column (null = untyped plain literal). */
  def dateDatatypeCol(s: Column): Column =
    when(s.rlike(isoPat), lit(NS.xsdDate))
      .when(s.rlike(yearPat), lit(NS.xsdGYear))
      .when(s.rlike(dmyPat), lit(NS.xsdDate))
      .otherwise(lit(null).cast("string"))

  /** struct(value, datatype) in one expression. */
  def dateTypeCol(s: Column): Column =
    struct(dateValueCol(s).as("value"), dateDatatypeCol(s).as("datatype"))
}
