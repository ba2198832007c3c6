package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.types._

/** Contract tests against the driver-generated testdata at
  * /root/testdata/sf0.001. The tables are an external input the driver
  * regenerates between rounds; a schema drift there (e.g. events.ts
  * switching from TIMESTAMP(NANOS) to TIMESTAMP(MICROS), round 4) should
  * fail ONE named test here, not 13 registered queries downstream.
  * Skipped silently when the testdata directory is absent (CI without
  * the fixture). */
class TestdataContractSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"
  private def available = new java.io.File(dir).isDirectory

  private def ifData(name: String)(body: => Unit): Unit =
    test(name) { assume(available, s"$dir not present"); body }

  ifData("all contract tables exist and are readable") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { tbl =>
      assert(new java.io.File(s"$dir/$tbl.parquet").exists(), s"$tbl.parquet missing")
      assert(spark.read.parquet(s"$dir/$tbl.parquet").schema.nonEmpty, s"$tbl unreadable")
    }
  }

  ifData("events.ts is a type the loader dispatches on") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val t = raw.schema("ts").dataType
    assert(t == LongType || t.isInstanceOf[TimestampNTZType] ||
      t.isInstanceOf[TimestampType],
      s"events.ts loaded as $t — Tables.normalizeTs has no branch for it")
  }

  ifData("Tables.events composes: normalized ts, non-empty") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType.isInstanceOf[TimestampType],
      s"normalized ts is ${ev.schema("ts").dataType}, expected timestamp")
    val row = ev.select("ts", "event_id").limit(1).collect()
    assert(row.nonEmpty, "events table is empty")
    assert(row.head.getTimestamp(0) != null, "ts normalized to null")
  }

  ifData("documents and embeddings carry the pipeline columns") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.columns.contains("text"), s"documents: ${docs.columns.mkString(",")}")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val vecField = emb.schema.fields.find(_.dataType.isInstanceOf[ArrayType])
    assert(vecField.nonEmpty, s"embeddings has no array column: ${emb.schema.simpleString}")
  }
}
