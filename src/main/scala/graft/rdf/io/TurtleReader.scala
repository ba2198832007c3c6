package graft.rdf.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}
import graft.rdf.Triple
import scala.collection.mutable

/** Turtle reader for the deterministic subset the engine writes
  * (Turtle.write) plus common hand-written Turtle: @prefix directives,
  * prefixed names, <IRI>s, `_:` blank nodes, string literals with
  * \-escapes, `^^datatype` and `@lang` qualifiers, `;` predicate lists,
  * `,` object lists. Out of scope (not produced by the reference's data):
  * anonymous bnode brackets, collections, multi-line strings.
  *
  * Together with JsonLd.parse this powers S12 — any-format RDF read with
  * a fallback chain (razu/turtle.py:18-32 tries formats until one
  * parses).
  */
object TurtleReader {

  def parse(text: String, bnodeSuffix: String = ""): Seq[Triple] = {
    val prefixes = mutable.Map[String, String]()
    val out = mutable.ArrayBuffer[Triple]()

    def resolve(term: String): String = {
      if (term.startsWith("<") && term.endsWith(">"))
        term.substring(1, term.length - 1)
      else {
        val i = term.indexOf(':')
        require(i >= 0, s"unresolvable term '$term'")
        val (p, local) = (term.substring(0, i), term.substring(i + 1))
        prefixes.get(p) match {
          case Some(ns) => ns + local
          case None => term // already absolute like http:...
        }
      }
    }

    def remapBnode(id: String): String =
      if (bnodeSuffix.nonEmpty) s"$id-$bnodeSuffix" else id

    // tokenization: IRIs, quoted strings (with escapes), punctuation
    def tokenize(s: String): Seq[String] = {
      val toks = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < s.length) {
        s(i) match {
          case c if c.isWhitespace => i += 1
          case '<' =>
            val e = s.indexOf('>', i)
            require(e > 0, s"unterminated IRI at $i")
            toks += s.substring(i, e + 1); i = e + 1
          case '"' =>
            var j = i + 1
            val sb = new StringBuilder("\"")
            while (j < s.length && s(j) != '"') {
              if (s(j) == '\\' && j + 1 < s.length) {
                sb.append(s(j)).append(s(j + 1)); j += 2
              } else { sb.append(s(j)); j += 1 }
            }
            require(j < s.length, s"unterminated string at $i")
            sb.append('"')
            j += 1
            // attach ^^dt or @lang directly following. A full-IRI
            // datatype (^^<http://…XMLSchema#date>) is consumed to its
            // closing '>' — IRIs contain dots, so the prefixed-name stop
            // set below would truncate it mid-authority.
            if (j + 2 < s.length && s(j) == '^' && s(j + 1) == '^'
                && s(j + 2) == '<') {
              val e = s.indexOf('>', j + 2)
              require(e > 0, s"unterminated datatype IRI at $j")
              sb.append(s.substring(j, e + 1)); j = e + 1
            } else {
              while (j < s.length && !s(j).isWhitespace
                && s(j) != ';' && s(j) != ',' && s(j) != '.') {
                sb.append(s(j)); j += 1
              }
            }
            // a trailing '.' may be the statement terminator
            toks += sb.toString(); i = j
          case c @ (';' | ',') => toks += c.toString; i += 1
          case '.' if i + 1 >= s.length || s(i + 1).isWhitespace =>
            toks += "."; i += 1
          case _ =>
            var j = i
            while (j < s.length && !s(j).isWhitespace
              && s(j) != ';' && s(j) != ',') j += 1
            var tok = s.substring(i, j)
            // statement-final dot sticks to the token
            if (tok.length > 1 && tok.endsWith(".")
                && (j >= s.length || s(j - 1) == '.')) {
              tok = tok.dropRight(1); toks += tok; toks += "."
            } else toks += tok
            i = j
        }
      }
      toks.toSeq
    }

    def unescape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s(i) == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case other => sb.append(other)
          }
          i += 2
        } else { sb.append(s(i)); i += 1 }
      }
      sb.toString
    }

    def objectOf(tok: String): (String, String, String, String) =
      if (tok.startsWith("\"")) {
        // escape-aware close scan (skip \x pairs): a lone look-behind
        // `tok(j-1) != '\\'` would treat the quote after an ESCAPED
        // backslash ("a\\") as still-escaped and run off the token
        val close = {
          var j = 1
          while (j < tok.length && tok(j) != '"') {
            if (tok(j) == '\\' && j + 1 < tok.length) j += 2 else j += 1
          }
          j
        }
        val value = unescape(tok.substring(1, close))
        val rest = tok.substring(close + 1)
        if (rest.startsWith("^^"))
          (value, Triple.LITERAL, resolve(rest.substring(2)), null)
        else if (rest.startsWith("@"))
          (value, Triple.LITERAL, null, rest.substring(1))
        else (value, Triple.LITERAL, null, null)
      } else if (tok.startsWith("_:"))
        (remapBnode(tok), Triple.BNODE, null, null)
      else (resolve(tok), Triple.URI, null, null)

    val toks = tokenize(text)
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case "@prefix" =>
          val p = toks(i + 1).stripSuffix(":")
          prefixes(p) = resolve(toks(i + 2))
          require(toks(i + 3) == ".", "malformed @prefix")
          i += 4
        case subjTok =>
          val subj =
            if (subjTok.startsWith("_:")) remapBnode(subjTok) else resolve(subjTok)
          i += 1
          var done = false
          while (!done && i < toks.length) {
            val pred = resolve(toks(i))
            i += 1
            var moreObjects = true
            while (moreObjects && i < toks.length) {
              val (v, kind, dt, lang) = objectOf(toks(i))
              out += Triple(subj, pred, v, kind, dt, lang)
              i += 1
              if (i < toks.length && toks(i) == ",") i += 1
              else moreObjects = false
            }
            if (i < toks.length && toks(i) == ";") i += 1
            else { // expect '.'
              if (i < toks.length && toks(i) == ".") i += 1
              done = true
            }
          }
      }
    }
    out.toSeq
  }

  /** Distributed read over a glob of Turtle files. */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, text) =>
        val suffix = java.lang.Long.toHexString(
          graft.text.Dedup.xxhash64String(file))
        parse(text, suffix)
      }
      .toDF(Triple.columns: _*)
  }
}

/** S12 — any-format RDF parse with fallback (razu/turtle.py:18-32): try
  * the extension's parser first, then the others until one succeeds. */
object AnyRdf {

  def parseAuto(text: String, bnodeSuffix: String = ""): Seq[Triple] = {
    val attempts: Seq[String => Seq[Triple]] = Seq(
      t => JsonLd.parse(t, bnodeSuffix),
      t => TurtleReader.parse(t, bnodeSuffix))
    val ordered =
      if (text.trim.startsWith("{") || text.trim.startsWith("[")) attempts
      else attempts.reverse
    val it = ordered.iterator
    var result: Option[Seq[Triple]] = None
    while (result.isEmpty && it.hasNext) {
      try {
        val r = it.next()(text)
        if (r.nonEmpty) result = Some(r)
      } catch { case _: Exception => () }
    }
    result.getOrElse(
      throw new IllegalArgumentException("no RDF parser accepted the input"))
  }

  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, text) =>
        val suffix = java.lang.Long.toHexString(
          graft.text.Dedup.xxhash64String(file))
        parseAuto(text, suffix)
      }
      .toDF(Triple.columns: _*)
  }
}
