package graft.sim

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** q94 cluster-balanced sampling: the rows-only driver check is weak, so
  * this spec carries the real guarantees — cap semantics, coverage, and
  * run-to-run determinism of the composed k-means + capPerGroup path. */
class ClusterBalanceSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run() =
    graft.SparkEntry.queries("q94_cluster_balance")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq

  test("every cluster keeps min(cap, size) members and all vectors are counted") {
    val rows = run()
    assert(rows.nonEmpty)
    rows.foreach { case (c, total, kept) =>
      assert(kept == math.min(20L, total), s"cluster $c: total=$total kept=$kept")
    }
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_._2).sum == nVecs, "every vector lands in exactly one cluster")
  }

  test("deterministic across runs") {
    assert(run() == run())
  }

  test("capped subset keeps the LOWEST ids within each cluster") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = Ivf.trainCentroids(e, nCentroids = 16)
    val assigned = Ivf.assignments(e, cents)
    val capped = graft.text.Curation.capPerGroup(
      assigned, "centroid", Seq(col("id").asc), cap = 20)
    val byCluster = assigned.select(col("centroid"), col("id"))
      .as[(Int, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.take(20).toSet).toMap
    val keptByCluster = capped.select(col("centroid"), col("id"))
      .as[(Int, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(keptByCluster == byCluster)
  }
}
