package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.sources.Tables

/** Pipeline-shaped queries: streaming-equivalent windowed aggregation and
  * sessionization over `events`, manifest hashing/validation over
  * `documents`, vocabulary broadcast-join resolution (J1), and multimodal
  * binary-column plumbing.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") Tables.events(s, dir) else Tables.table(s, dir, name)

  /** Fixture vocabulary for J1 resolution (replaces the reference's live
    * SPARQL endpoint, razu/concept_resolver.py:65-114). */
  val langVocab: Seq[(String, String)] = Seq(
    "en" -> "English", "de" -> "German", "fr" -> "French",
    "es" -> "Spanish", "zh" -> "Chinese", "nl" -> "Dutch")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling-window aggregation (batch-equivalent of the Structured
    // Streaming pipeline in graft.streaming): 1-hour windows per type
    "q30_windowed_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")),

    // Sessionization: 30-minute-gap sessions per user (lag + running sum —
    // the batch shape of flatMapGroupsWithState session windows)
    "q31_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      t(s, dir, "events")
        .withColumn("brk",
          when(lag(col("ts"), 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > gapUs,
            lit(1L)).otherwise(lit(0L)))
        .withColumn("sess", sum("brk").over(w))
        .groupBy("user_id", "sess").agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), max("cnt").as("max_session_events"))
        .orderBy("user_id")
    }),

    // Native session_window (30-minute gap): Catalyst's built-in session
    // assignment — no lag/running-sum window pair, and the identical
    // expression runs under Structured Streaming with a watermark. Spark
    // closes a session when the next event is >= gap after the last
    // (window end = last ts + gap, exclusive); the oracle replicates
    // that boundary with a >= break
    "q83_session_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")),

    // As-of join (click -> most recent preceding view per user): one
    // hash shuffle + partitioned sort, never a range nested-loop; the
    // oracle is DuckDB's native ASOF LEFT JOIN
    "q59_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("event_type"))
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
      val views = e.filter(col("event_type") === "view").drop("event_type")
      graft.ops.Relational.asofJoin(clicks, views,
          keys = Seq("user_id"), tsCol = "ts",
          payload = Seq("event_id", "value"),
          rightTieBreak = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"),
          col("asof_event_id"), col("asof_value"))
        .orderBy("event_id")
    }),

    // The SAME as-of join through the native whole-operator tier
    // (AsofJoinNode → injected strategy → AsofJoinExec partition-local
    // sorted merge): one exchange per side, no union, no WindowExec,
    // output partitioning reusable downstream. Same oracle as q59 —
    // two implementations, one contract.
    "q137_asof_native" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("event_type"))
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
      val views = e.filter(col("event_type") === "view").drop("event_type")
      graft.plans.AsofJoin.join(clicks, views,
          keys = Seq("user_id"), tsCol = "ts",
          payload = Seq("event_id", "value"),
          rightTieBreak = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"),
          col("asof_event_id"), col("asof_value"))
        .orderBy("event_id")
    }),

    // Range join (click inside a 30-min window opened by each view):
    // bucketized equi-join — intervals explode to their overlapped
    // buckets, a point hashes to one bucket, exact BETWEEN re-checked —
    // never the nested-loop a raw range predicate would plan
    "q60_range_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
      val halfHourUs = 30L * 60 * 1000000
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts_us").as("start_us"),
          (col("ts_us") + halfHourUs).as("end_us"))
      graft.ops.Relational.rangeJoin(clicks, views, keys = Seq("user_id"),
          tsCol = "ts_us", startCol = "start_us", endCol = "end_us",
          bucketWidth = halfHourUs)
        .select(col("click_id"), col("view_id"), col("user_id"))
        .orderBy("click_id", "view_id")
    }),

    // H1/H3 — content hash + stored-vs-computed validation
    // (razu/util.py:155-163, razu/manifest.py:204-215)
    "q32_doc_manifest" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("md5hash"),
          length(col("text")).cast("long").as("size"),
          when(length(col("text")) === col("n_chars"), lit("valid"))
            .otherwise(lit("mismatch")).as("status"))
        .orderBy("doc_id")),

    // J1 — vocabulary broadcast-join resolution with explicit miss marker
    // (the reference hard-exits on a miss, razu/concept_resolver.py:114;
    // distributed version surfaces misses as rows instead)
    "q33_vocab_resolve" -> ((s, dir) => {
      val vocab = broadcast(
        s.createDataFrame(langVocab).toDF("lang", "lang_label"))
      t(s, dir, "documents")
        .join(vocab, Seq("lang"), "left")
        .select(col("doc_id"),
          coalesce(col("lang_label"), lit("UNRESOLVED")).as("label"))
        .orderBy("doc_id")
    }),

    // Multimodal binary plumbing: opaque binary column + typed metadata
    // (byte length, magic bytes, deterministic fake feature from the
    // content prefix — the decode stub in graft.multimodal)
    "q34_binary_meta" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"),
          col("text"))
        .select(col("doc_id"),
          length(col("content")).cast("long").as("n_bytes"),
          upper(hex(substring(col("content"), 1, 4))).as("magic"),
          Hashing.polyHashCol(substring(col("text"), 1, 16)).as("fake_feature"))
        .orderBy("doc_id")),

    // Image perceptual-hash near-dup (dHash + pigeonhole band join):
    // real BMP bytes synthesized per doc through the REAL
    // javax.imageio encode/decode path — docs with doc_id % 10 == 1
    // render a 1-pixel-tweaked copy of their predecessor's image, so
    // every planted pair must surface within Hamming <= 3. Rows-only
    // (DuckDB cannot decode images); MultimodalSpec carries the
    // hand-built gradient/uniform exactness and the recall gate
    "q107_image_neardup" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val imgs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val seed = if (id % 10 == 1) id - 1 else id
          val tweak = id % 10 == 1
          (id, PipelineQueries.syntheticBmp(seed, tweak))
        })
        .toDF("doc_id", "content")
      graft.multimodal.Multimodal.imageNearDupPairs(
          graft.multimodal.Multimodal.dHashTable(imgs, keyCol = "doc_id"),
          maxHamming = 3)
        .orderBy("key_a", "key_b")
    }),

    // J1 full label-variant resolution (concept_resolver.py:86-100):
    // vocabulary triple snapshot built from `nation` with prefLabel /
    // altLabel@nl / notation / identifier@en variants plus a decoy
    // altLabel duplicate of every prefLabel (precedence must pick the
    // prefLabel concept); terms drawn per customer exercise each variant
    // and a guaranteed miss
    "q40_vocab_variants" -> ((s, dir) => {
      import graft.rdf.NS
      import graft.vocab.Vocab
      val nation = t(s, dir, "nation")
      def triples(pred: String, value: Column, lang: Option[String],
                  subj: Column): DataFrame =
        nation.select(subj.as("subject"), lit(pred).as("predicate"),
          value.cast("string").as("objectValue"),
          lit("literal").as("objectKind"),
          lit(null).cast("string").as("datatype"),
          lang.map(lit(_)).getOrElse(lit(null)).cast("string").as("lang"))
      val uri = concat(lit("urn:nation:"), col("n_nationkey"))
      val vocabTriples = triples(NS.SKOS + "prefLabel", col("n_name"), None, uri)
        .unionByName(triples(NS.SKOS + "altLabel",
          concat(lit("alt-"), lower(col("n_name"))), Some("nl"), uri))
        .unionByName(triples(NS.SKOS + "notation",
          col("n_nationkey").cast("string"), None, uri))
        .unionByName(triples(NS.SCHEMA + "identifier",
          concat(lit("id-"), col("n_nationkey")), Some("en"), uri))
        .unionByName(triples(NS.SKOS + "altLabel", col("n_name"), None,
          concat(lit("urn:dup:"), col("n_nationkey"))))
      val terms = t(s, dir, "customer")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"),
          when(pmod(col("c_custkey"), lit(4)) === 0, col("n_name"))
            .when(pmod(col("c_custkey"), lit(4)) === 1,
              concat(lit("alt-"), lower(col("n_name"))))
            .when(pmod(col("c_custkey"), lit(4)) === 2,
              col("n_nationkey").cast("string"))
            .otherwise(concat(lit("missing-"), col("c_custkey"))).as("term"))
      Vocab.resolve(terms, col("term"), Vocab.lookupTable(vocabTriples), "uri")
        .select(col("c_custkey"),
          coalesce(col("uri"), lit("UNRESOLVED")).as("uri"))
        .orderBy("c_custkey")
    }),

    // q107's PAIRING substep, hash-checked: the pigeonhole band join +
    // luma re-check + exact bit_count prune run over a deterministic
    // synthetic (key, dhash, luma) table both engines regenerate from
    // integer hash arithmetic (DuckDB cannot decode images, but the
    // near-dup pairing semantics are pure SQL once hashes exist).
    // Planted near-dups: key%10==1 reuses key-1's 60-bit hash with two
    // pseudo-random bits flipped and the same luma. Runs the SAME
    // Multimodal.imageNearDupPairs code q107 runs; the oracle computes
    // the all-pairs answer directly, independently confirming the band
    // join is lossless at maxHamming=3
    "q117_dhash_band_join" -> ((s, dir) => {
      def sm(c: Column): Column = Hashing.squareMixCol(c)
      val h = t(s, dir, "documents").select(col("doc_id").as("key"))
        .withColumn("seed",
          when(col("key") % 10 === 1, col("key") - 1).otherwise(col("key"))
            .cast("string"))
        .withColumn("base", (0 to 3).map { j =>
            shiftleft(sm(Hashing.polyHashCol(
              concat(col("seed"), lit(s":$j")))) % 32768, 15 * j)
          }.reduce(_.bitwiseOR(_)))
        .withColumn("p1", sm(Hashing.polyHashCol(
          concat(lit("f:"), col("key").cast("string")))) % 60)
        .withColumn("p2", sm(Hashing.polyHashCol(
          concat(lit("g:"), col("key").cast("string")))) % 60)
        .withColumn("dhash", when(col("key") % 10 === 1,
            col("base")
              .bitwiseXOR(expr("shiftleft(cast(1 as bigint), cast(p1 as int))"))
              .bitwiseXOR(expr("shiftleft(cast(1 as bigint), cast(p2 as int))")))
          .otherwise(col("base")))
        .withColumn("luma", sm(Hashing.polyHashCol(
          concat(lit("l:"), col("seed")))) % 256)
        .select("key", "dhash", "luma")
      graft.multimodal.Multimodal.imageNearDupPairs(h, maxHamming = 3)
        .orderBy("key_a", "key_b")
    }))

  /** Deterministic 16x16 BMP: per-seed gradient directions/frequencies
    * (so different seeds produce genuinely different dHashes — a mere
    * brightness offset would leave every difference hash identical);
    * `tweak` brightens one pixel, the near-dup perturbation. BMP is an
    * uncompressed fixed-layout container, so the bytes are bit-stable
    * across runs and partitions. */
  private[queries] def syntheticBmp(seed: Long, tweak: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val fx = 3 + Math.floorMod(seed, 13L).toInt
    val fy = 5 + Math.floorMod(seed, 11L).toInt
    val fxy = 1 + Math.floorMod(seed, 7L).toInt
    for (y <- 0 until 16; x <- 0 until 16) {
      var lum = Math.floorMod(x * fx + y * fy + x * y * fxy, 256)
      if (tweak && x == 0 && y == 0) lum = math.min(lum + 4, 255)
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  val oracles: Map[String, String] = Map(
    "q30_windowed_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q31_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
        |  FROM x),
        |g AS (SELECT user_id, sess, COUNT(*) AS cnt FROM s GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(cnt) AS max_session_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q83_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess
        |  FROM x)
        |SELECT user_id,
        |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |       COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,

    "q60_range_join" ->
      """WITH l AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'click'),
        |r AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS start_us,
        |             epoch_us(ts) + 1800000000 AS end_us
        |      FROM events WHERE event_type = 'view')
        |SELECT l.click_id, r.view_id, l.user_id
        |FROM l JOIN r ON l.user_id = r.user_id
        |              AND l.ts_us BETWEEN r.start_us AND r.end_us
        |ORDER BY click_id, view_id""".stripMargin,

    "q59_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT event_id, user_id, ts, value FROM events
        |      WHERE event_type = 'view')
        |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.value,
        |       r.event_id AS asof_event_id, r.value AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // identical contract to q59, exercised through the native operator
    "q137_asof_native" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT event_id, user_id, ts, value FROM events
        |      WHERE event_type = 'view')
        |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.value,
        |       r.event_id AS asof_event_id, r.value AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q32_doc_manifest" ->
      """SELECT doc_id, md5(text) AS md5hash,
        |       CAST(length(text) AS BIGINT) AS size,
        |       CASE WHEN length(text) = n_chars THEN 'valid'
        |            ELSE 'mismatch' END AS status
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q33_vocab_resolve" -> {
      val vals = langVocab.map { case (l, n) => s"('$l', '$n')" }.mkString(", ")
      s"""WITH vocab(lang, lang_label) AS (VALUES $vals)
         |SELECT doc_id, coalesce(v.lang_label, 'UNRESOLVED') AS label
         |FROM documents d LEFT JOIN vocab v USING (lang)
         |ORDER BY doc_id""".stripMargin
    },

    "q34_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        |       upper(hex(substr(text, 1, 4))) AS magic,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(substr(text, 1, 16), ''),
        |           c -> CAST(ascii(c) AS BIGINT))),
        |         (a, b) -> (a * 31 + b) % 1000000007) AS fake_feature
        |FROM documents ORDER BY doc_id""".stripMargin,

    // precedence values = predicateIndex * 3 + langIndex (see
    // graft.vocab.Vocab: predicates [prefLabel name label altLabel
    // identifier notation] x langs [plain nl en])
    "q40_vocab_variants" ->
      """WITH vocab(uri, term, prec) AS (
        |  SELECT 'urn:nation:' || n_nationkey, n_name, 0 FROM nation
        |  UNION ALL SELECT 'urn:nation:' || n_nationkey, 'alt-' || lower(n_name), 10 FROM nation
        |  UNION ALL SELECT 'urn:nation:' || n_nationkey, CAST(n_nationkey AS VARCHAR), 15 FROM nation
        |  UNION ALL SELECT 'urn:nation:' || n_nationkey, 'id-' || n_nationkey, 14 FROM nation
        |  UNION ALL SELECT 'urn:dup:' || n_nationkey, n_name, 9 FROM nation),
        |best AS (
        |  SELECT term, uri FROM (
        |    SELECT term, uri,
        |           row_number() OVER (PARTITION BY term ORDER BY prec, uri) AS rn
        |    FROM vocab) WHERE rn = 1),
        |terms AS (
        |  SELECT c_custkey,
        |         CASE c_custkey % 4
        |           WHEN 0 THEN n_name
        |           WHEN 1 THEN 'alt-' || lower(n_name)
        |           WHEN 2 THEN CAST(n_nationkey AS VARCHAR)
        |           ELSE 'missing-' || c_custkey END AS term
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT c_custkey, coalesce(b.uri, 'UNRESOLVED') AS uri
        |FROM terms LEFT JOIN best b USING (term)
        |ORDER BY c_custkey""".stripMargin,

    // direct all-pairs replay of the synthetic dHash near-dup pairing:
    // the engine's band join is pigeonhole-lossless at maxHamming=3, so
    // the brute-force answer must match exactly
    "q117_dhash_band_join" ->
      s"""WITH ks AS (SELECT doc_id AS key,
         |         CAST(CASE WHEN doc_id % 10 = 1 THEN doc_id - 1
         |                   ELSE doc_id END AS VARCHAR) AS seed
         |       FROM documents),
         |parts AS (SELECT key, seed, j,
         |            (${sqmixOfPoly("seed || ':' || CAST(j AS VARCHAR)")})
         |              % 32768 AS piece
         |          FROM ks CROSS JOIN (SELECT unnest(range(0, 4)) AS j) jj),
         |b AS (SELECT key, any_value(seed) AS seed,
         |        CAST(SUM(piece * (CAST(1 AS BIGINT) << CAST(15 * j AS INT)))
         |             AS BIGINT) AS base
         |      FROM parts GROUP BY key),
         |h AS (SELECT key,
         |        CASE WHEN key % 10 = 1
         |          THEN xor(xor(base,
         |                 CAST(1 AS BIGINT) << CAST(
         |                   (${sqmixOfPoly("'f:' || CAST(key AS VARCHAR)")})
         |                     % 60 AS INT)),
         |                 CAST(1 AS BIGINT) << CAST(
         |                   (${sqmixOfPoly("'g:' || CAST(key AS VARCHAR)")})
         |                     % 60 AS INT))
         |          ELSE base END AS dhash,
         |        (${sqmixOfPoly("'l:' || seed")}) % 256 AS luma
         |      FROM b)
         |SELECT a.key AS key_a, c.key AS key_b,
         |       CAST(bit_count(xor(a.dhash, c.dhash)) AS BIGINT) AS hamming
         |FROM h a JOIN h c ON a.key < c.key
         |WHERE abs(a.luma - c.luma) <= 16
         |  AND bit_count(xor(a.dhash, c.dhash)) <= 3
         |ORDER BY key_a, key_b""".stripMargin)

  private def sqmixOfPoly(e: String): String =
    TextQueries.Sql.sqmixOfPoly(e)
}
