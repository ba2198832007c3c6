package graft.rdf.io

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.rdf.{NS, Triple}

/** Property test: writer → reader is the identity on the triple SET for
  * arbitrary (valid) triples — the class of tokenizer edge case that
  * slipped through example-based tests (full-IRI datatypes with dots in
  * the authority) should not recur for quoting, escapes, unicode, langs,
  * or IRI shapes. Pure driver-side (Turtle.document / TurtleReader.parse
  * are plain functions), so the property runs without Spark jobs. */
class TurtleRoundTripPropSpec extends AnyFunSuite {

  private val genIriTail: Gen[String] = for {
    segs <- Gen.choose(1, 3)
    parts <- Gen.listOfN(segs, Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
    frag <- Gen.option(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
  } yield parts.mkString("/") + frag.map("#" + _).getOrElse("")

  private val genIri: Gen[String] = for {
    host <- Gen.oneOf("example.org", "www.w3.org", "data.razu.nl", "a.b.c.example")
    tail <- genIriTail
  } yield s"https://$host/$tail"

  // literal values exercising every escape class + unicode + edge shapes
  private val genLiteral: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(40)),
    Gen.nonEmptyListOf(Gen.oneOf('a', '"', '\\', '\n', '\r', '\t', ';', ',',
      '.', '<', '>', '@', '^', ' ')).map(_.mkString.take(40)),
    Gen.const(""),
    Gen.const("line1\nline2\t\"quoted\" \\slash"),
    Gen.const("ünïcödé 文字 🙂"),
    Gen.const("ends with dot."),
    Gen.const("1984-01-01"))

  private val genDatatype: Gen[String] = Gen.oneOf(
    NS.xsdInteger, NS.xsdDate, NS.xsdAnyURI,
    "http://www.w3.org/2001/XMLSchema#string",
    "https://a.b.c.example/custom/dt#x")

  private val genTriple: Gen[Triple] = for {
    s <- Gen.oneOf(genIri, Gen.nonEmptyListOf(Gen.alphaNumChar)
      .map(cs => "_:b" + cs.mkString.take(8)))
    p <- genIri
    kind <- Gen.oneOf("uri", "bnode", "literal", "literal", "literal")
    t <- kind match {
      case "uri" => genIri.map(o => Triple(s, p, o, Triple.URI, null, null))
      case "bnode" => Gen.nonEmptyListOf(Gen.alphaNumChar)
        .map(cs => Triple(s, p, "_:o" + cs.mkString.take(8), Triple.BNODE, null, null))
      case _ => for {
        v <- genLiteral
        dtOrLang <- Gen.oneOf(
          Gen.const((null: String, null: String)),
          genDatatype.map(dt => (dt, null: String)),
          Gen.oneOf("nl", "en", "de-DE").map(l => (null: String, l)))
      } yield Triple(s, p, v, Triple.LITERAL, dtOrLang._1, dtOrLang._2)
    }
  } yield t

  private def key(t: Triple) =
    (t.subject, t.predicate, t.objectValue, t.objectKind,
      Option(t.datatype).getOrElse(""), Option(t.lang).getOrElse(""))

  /** Driver-side document from the writer's own term/escape functions
    * (one statement per triple — layout differs from Turtle.document's
    * grouped blocks, the escaping and term forms are identical, and
    * graph equality is by triple set anyway). */
  private def doc(ts: Seq[Triple]): String = {
    val header = NS.prefixes
      .map { case (p, ns) => s"@prefix $p: <$ns> ." }.mkString("\n")
    val body = ts.map { t =>
      val s = if (t.subject.startsWith("_:")) t.subject else Turtle.term(t.subject)
      s"$s ${Turtle.term(t.predicate)} " +
        s"${Turtle.objectTerm(t.objectValue, t.objectKind, t.datatype, t.lang)} ."
    }.mkString("\n")
    header + "\n" + body + "\n"
  }

  test("Turtle document -> parse is the identity on arbitrary triple sets") {
    val prop = Prop.forAll(Gen.listOfN(12, genTriple)) { ts =>
      val d = doc(ts)
      val got =
        try TurtleReader.parse(d).map(key).toSet
        catch { case e: Throwable =>
          println(s"PARSE THREW ${e.getMessage}\nDOC:\n$d"); throw e
        }
      val expect = ts.map(key).toSet
      if (got != expect) {
        println(s"DOC:\n$d\nMISSING: ${expect -- got}\nEXTRA: ${got -- expect}")
      }
      got == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString.take(2000))
  }
}
