package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index-and-probe incremental BM25 — the TEXT-retrieval index family
  * beside the band index ([[IncrementalDedup]]) and the vector indexes
  * ([[graft.sim.IncrementalAnn]]/[[graft.sim.IncrementalPq]]):
  * [[Bm25.topKBatch]] re-tokenizes and re-scans the corpus per query
  * batch, which is right for one-shot jobs; at 100 TB the steady state
  * is "tokenize ONCE into persisted postings, then serve every query
  * batch from the index" — with append/delete/compaction so the index
  * runs forever without a rebuild.
  *
  * Layout (via [[graft.sources.Bucketed]], so both tables get the
  * generation-manifest commit + maintenance lock for free):
  *
  *   - `<name>_postings` (tok, id, tf, dl), bucketed AND sorted on
  *     `tok`. The doc length is DENORMALIZED into the posting (one
  *     extra long per row, one build-time id-join shuffle — the
  *     filtered-ANN attr doctrine): scoring needs dl per candidate
  *     row, and fetching it from a side table would cost a full
  *     doc-length scan or an id-keyed shuffle PER PROBE — at corpus
  *     scale, the difference between a serving call and a batch job.
  *     A probe therefore touches nothing but the pruned postings: the
  *     batch's distinct terms (bounded driver state, the
  *     [[IncrementalDedup.probe]] pushdown doctrine) land as an
  *     `isin` in the scan's PushedFilters, and because every file is
  *     SORTED on tok, parquet row-group min/max skipping cuts the
  *     read to the matching row groups. (Whole-bucket pruning does
  *     not apply here: Spark keeps a bucketed scan only when a
  *     downstream operator uses the bucketing, and this serving
  *     plan's joins are broadcasts — the bucket layout still bounds
  *     per-bucket file counts via compaction, keeps deletion
  *     O(touched buckets), and keeps the sorted-run skip property
  *     compaction restores.) df(term) derives from the same pruned
  *     rows (each (tok, id) appears once).
  *   - `<name>_stats` one (k=0, n_docs, tot_tok) row, 1 bucket:
  *     corpus-global N and avgdl, maintained INCREMENTALLY by
  *     append/delete through [[graft.sources.Bucketed.replaceAll]]'s
  *     atomic one-manifest swap — a probe must not pay an O(corpus)
  *     aggregation for two scalars. Each table's commit is atomic,
  *     but the PAIR is not: a crash between the postings commit and
  *     the stats commit (or an uncertain retry of a mutation — the
  *     stats row is an accumulator and must not be re-applied
  *     blindly) leaves the two out of step. [[repairStats]] is the
  *     healing op for exactly that window: one index scan recomputes
  *     the row from the postings themselves. In-process, concurrent
  *     mutations serialize their read-modify-write on a per-index
  *     monitor so no delta is lost.
  *
  * Determinism: the probe reuses [[Bm25]]'s exact quantized formulas
  * (ONE copy of the idf/weight arithmetic), so against the same corpus
  * a probe from the index is bit-identical to [[Bm25.topKBatch]] on
  * the raw documents — spec-pinned, and the q147 oracle replays the
  * index-transparent form.
  *
  * Duplicate postings (an at-least-once append replay landing the same
  * rows twice) inflate per-doc term multiplicity AND df counts until
  * the next compaction dedups them — the band-index healing contract,
  * one notch sharper here because df feeds idf. Deletion is
  * content-derived like every index in the family: the deleted docs'
  * terms recompute from their text, naming the affected buckets
  * without an index scan. */
object IncrementalBm25 {

  private def postingsTable(name: String) = s"${name}_postings"
  private def statsTable(name: String) = s"${name}_stats"

  /** The checkpointed (id, dl) projection of `docs` — ONE
    * tokenization-count pass serving the posting join AND the stats
    * delta (the Bm25.topK reuse doctrine: without it every consumer
    * re-tokenizes the input). IDs UNIQUE within the input is the
    * shared batch contract (a duplicated row would double tf and the
    * stats delta alike). */
  private def dlOf(docs: DataFrame, textCol: String,
                   idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokenCountCol(col(textCol)).cast("long").as("dl"))
      .localCheckpoint(eager = false)

  /** (tok, id, tf, dl) posting rows — the same tokenization as the
    * in-memory paths; dl rides each posting (see the object
    * scaladoc). */
  private def postingsOf(docs: DataFrame, dl: DataFrame, textCol: String,
                         idCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.wordsCol(col(textCol))).as("tok"))
      .groupBy("tok", "id").agg(count(lit(1)).as("tf"))
      .join(dl, "id")
      .select("tok", "id", "tf", "dl")

  /** (n_docs, tot_tok) of a batch, from its checkpointed dl rows. */
  private def batchStats(dl: DataFrame): (Long, Long) = {
    val spark = dl.sparkSession
    import spark.implicits._
    dl.agg(count(lit(1)), coalesce(sum("dl"), lit(0L)))
      .as[(Long, Long)].head()
  }

  private def statsOf(spark: SparkSession, name: String): (Long, Long) = {
    val r = graft.sources.Bucketed.load(spark, statsTable(name))
      .select("n_docs", "tot_tok").head()
    (r.getLong(0), r.getLong(1))
  }

  /** Per-index monitors serializing the stats read-modify-write: two
    * concurrent mutations would otherwise lose one delta (the stats
    * row is the only cross-mutation accumulator in the family).
    * In-process like every lock here; cross-process mutation is the
    * single-writer-process contract. */
  private val statsMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def withStatsLock[A](name: String)(body: => A): A =
    statsMonitors.computeIfAbsent(name, _ => new Object)
      .synchronized(body)

  private def writeStats(spark: SparkSession, name: String, nDocs: Long,
                         totTok: Long, fresh: Boolean): Unit = {
    import spark.implicits._
    val row = Seq((0, nDocs, totTok)).toDF("k", "n_docs", "tot_tok")
    if (fresh)
      graft.sources.Bucketed.save(row, statsTable(name), Seq("k"), 1)
    else {
      graft.sources.Bucketed.replaceAll(spark, statsTable(name), row)
      ()
    }
  }

  /** Recompute the stats row FROM the postings table — the healing op
    * for the one crash window this two-table family has: postings and
    * stats commit through separate manifests, so a crash between the
    * two commits (or an uncertain retry) can leave the delta applied
    * to one table only. Each (id, dl) pair appears once per distinct
    * term of the doc; distinct-ing recovers the per-doc lengths, one
    * index scan. Run after any mutation whose completion is in doubt
    * — the "re-run the op" doctrine's counterpart for accumulators
    * that must not be re-applied blindly. NOTE: a doc with ZERO
    * tokens has no postings and is invisible here; its absence
    * shifts N by its (empty) contribution only. */
  def repairStats(spark: SparkSession, name: String): (Long, Long) = {
    import spark.implicits._
    val (n, tot) = graft.sources.Bucketed.load(spark, postingsTable(name))
      .select("id", "dl").distinct()
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L)))
      .as[(Long, Long)].head()
    withStatsLock(name) {
      writeStats(spark, name, n, tot, fresh = false)
    }
    (n, tot)
  }

  /** Tokenize `corpus` and (re)build the index. One tokenize pass +
    * one bucket-write shuffle (+ the dl id-join) — paid once, not per
    * query batch. */
  def buildIndex(corpus: DataFrame, name: String, buckets: Int,
                 textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val spark = corpus.sparkSession
    val dl = dlOf(corpus, textCol, idCol)
    graft.sources.Bucketed.save(postingsOf(corpus, dl, textCol, idCol),
      postingsTable(name), Seq("tok"), buckets)
    val (n, tot) = batchStats(dl)
    withStatsLock(name) { writeStats(spark, name, n, tot, fresh = true) }
  }

  /** Append newly-ingested docs: their postings land in the existing
    * bucket layout (probe plans stay valid), the stats row advances by
    * the batch's delta through one atomic manifest swap. Call AFTER
    * any probe that should not see the batch. */
  def appendToIndex(newDocs: DataFrame, name: String, buckets: Int,
                    textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val spark = newDocs.sparkSession
    val dl = dlOf(newDocs, textCol, idCol)
    graft.sources.Bucketed.save(postingsOf(newDocs, dl, textCol, idCol),
      postingsTable(name), Seq("tok"), buckets, mode = SaveMode.Append)
    val (dn, dtot) = batchStats(dl)
    withStatsLock(name) {
      val (n, tot) = statsOf(spark, name)
      writeStats(spark, name, n + dn, tot + dtot, fresh = false)
    }
  }

  /** Remove docs at O(touched buckets): their terms recompute from
    * content, naming the affected buckets (pmod(hash(tok), buckets))
    * without an index scan; those buckets rewrite anti-joining the ids
    * out, and the stats row retreats by the deleted docs' delta.
    * Content must match what was indexed (the content-derived deletion
    * doctrine shared by every index family). Returns the number of
    * buckets rewritten. */
  def deleteFromIndex(docs: DataFrame, name: String, buckets: Int,
                      textCol: String = "text", idCol: String = "doc_id"): Int = {
    val spark = docs.sparkSession
    import spark.implicits._
    // dedup by id FIRST: the postings anti-join is naturally
    // duplicate-tolerant (ids.distinct) but the stats retreat is an
    // accumulator — a doc repeated in an erasure batch must subtract
    // its (1, dl) delta exactly once
    val uniq = docs.dropDuplicates(idCol)
    val dl = dlOf(uniq, textCol, idCol)
    val del = postingsOf(uniq, dl, textCol, idCol)
      .localCheckpoint(eager = false) // bucket-id collect + id join
    val tokBuckets = del
      .select(pmod(hash(col("tok")), lit(buckets)).cast("int").as("b"))
      .distinct().as[Int].collect().toSet
    val ids = del.select("id").distinct()
    val nRewritten = graft.sources.Bucketed.rewriteBuckets(spark,
      postingsTable(name), tokBuckets,
      idx => idx.join(broadcast(ids), Seq("id"), "left_anti")
        .dropDuplicates())
    val (dn, dtot) = batchStats(dl)
    withStatsLock(name) {
      val (n, tot) = statsOf(spark, name)
      writeStats(spark, name, n - dn, tot - dtot, fresh = false)
    }
    nRewritten
  }

  /** Periodic compaction — postings are a SET, and dedup-on-rewrite
    * also heals append-replay duplicates (which here would inflate
    * df). Returns buckets rewritten. */
  def compactIndex(spark: SparkSession, name: String,
                   maxFilesPerBucket: Int = 4): Int =
    graft.sources.Bucketed.compactBuckets(spark, postingsTable(name),
      maxFilesPerBucket)

  /** Per-query BM25 top-`k` — (query_id, doc_id, score_e6, n_terms,
    * rank), the [[Bm25.topKBatch]] contract — served from the index
    * WITHOUT touching the corpus: the batch's distinct terms (bounded
    * driver state) prune the postings scan to their buckets, df/idf
    * derive from the same pruned rows, dl rides the posting, and
    * N/avgdl come from the one-row stats table. Adding a query adds
    * broadcast rows, not scans. */
  def probe(spark: SparkSession, queries: DataFrame, name: String,
            k: Int = 20, queryIdCol: String = "query_id",
            termsCol: String = "terms"): DataFrame = {
    import spark.implicits._
    val qt = queries.select(
        col(queryIdCol).cast("long").as("query_id"),
        explode(array_distinct(col(termsCol))).as("tok"))
      .dropDuplicates("query_id", "tok")
      .localCheckpoint(eager = false) // term collect + per-query fan-out
    val terms = qt.select("tok").distinct().as[String].collect().sorted
    val (nDocs, totTok) = statsOf(spark, name)
    require(nDocs > 0, "BM25 probe against an empty index")
    val avgdl = totTok.toDouble / nDocs.toDouble
    val tf = graft.sources.Bucketed.load(spark, postingsTable(name))
      .filter(col("tok").isin(terms.toIndexedSeq: _*))
      .localCheckpoint(eager = false) // feeds df AND the scoring rows
    val idf = broadcast(
      tf.groupBy("tok").agg(count(lit(1)).as("df"))
        .withColumn("idf_e6", Bm25.idfE6Col(nDocs, col("df")))
        .select("tok", "idf_e6"))
    val scored = tf.join(idf, "tok")
      .withColumn("w_e6",
        Bm25.wE6Col(col("idf_e6"), col("tf"), col("dl"), avgdl))
      .join(broadcast(qt), Seq("tok"))
      .groupBy("query_id", "id")
      .agg(sum("w_e6").as("score_e6"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_e6").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("doc_id"), col("score_e6"),
        col("n_terms"), col("rank"))
  }
}
