package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Proves the bucketed-join claim: joining two tables bucketed+sorted on
  * the join key plans WITHOUT any Exchange (and reconcile over bucketed
  * manifests inherits it). */
class BucketedSpec extends SparkSuite {
  import spark.implicits._

  test("join of co-bucketed tables has no shuffle Exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 5000).map(i => (s"path/$i", s"hash_a_$i")).toDF("path", "md5hash")
      val b = (1 to 5000).map(i => (s"path/$i", s"hash_b_$i")).toDF("path", "md5hash")
      Bucketed.save(a, "graft_bucketed_a", Seq("path"), buckets = 4)
      Bucketed.save(b, "graft_bucketed_b", Seq("path"), buckets = 4)
      val la = Bucketed.load(spark, "graft_bucketed_a")
      val lb = Bucketed.load(spark, "graft_bucketed_b")
        .select(col("path"), col("md5hash").as("hash_b"))
      val joined = la.join(lb, Seq("path"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 5000)
      // the documented reconcile path (full outer on the bucket key)
      // rides the same shape: no Exchange either
      val rec = graft.ops.Relational.reconcile(
        la.select(col("path"), col("md5hash").as("ha")),
        lb.select(col("path"), col("hash_b").as("hb")),
        "path", col("ha"), col("hb"))
      val recPlan = rec.queryExecution.executedPlan.toString
      assert(!recPlan.contains("Exchange"),
        s"bucketed reconcile must not shuffle:\n$recPlan")
      assert(rec.filter(col("status") === "mismatch").count() == 5000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }
}
