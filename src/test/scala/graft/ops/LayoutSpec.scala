package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the Morton arithmetic (hand-computed interleavings under
  * identity quantization), constant-column degradation, and the
  * range-partitioned write layout. */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zValue: hand-computed bit interleavings") {
    val df = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y")))
    val got = df.select("z").collect().map(_.getLong(0)).toSeq
    // interleave(3,5): x bits {0,1} -> 1+4, y bits {0,2} -> 2+32 = 39
    // x=0xFFFF -> even bits of 32-bit word; y=0xFFFF -> odd bits
    assert(got == Seq(39L, 0L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("zorder: identity quantization when domain is exactly 0..65535") {
    // plant min=0 and max=65535 so quantization is the identity map
    val df = (Seq((0L, 0L), (65535L, 65535L)) ++ Seq((3L, 5L), (7L, 2L)))
      .toDF("x", "y")
    val got = Layout.zorder(df, "x", "y")
      .filter(col("x") === 3L).select("zorder").head().getLong(0)
    assert(got == 39L)
    // z respects quadrant nesting: any (x,y) in the low half of both
    // domains sorts before any point in the high half of both
    val all = Layout.zorder(df, "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lowMax = all.filter(t => t._1 < 32768 && t._2 < 32768).map(_._3).max
    val highMin = all.filter(t => t._1 >= 32768 && t._2 >= 32768).map(_._3).min
    assert(lowMax < highMin)
  }

  test("zorder: constant column quantizes to zero, key = other axis") {
    val df = Seq((7L, 9L), (7L, 13L)).toDF("x", "y")
    val z = Layout.zorder(df, "x", "y").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // x constant -> qx=0; y spans [9,13] -> qy = floor((y-9)*65535/4)
    def qy(y: Long) = math.floor((y - 9).toDouble * 65535.0 / 4.0).toLong
    def spread(v: Long): Long = {
      var x = v
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      x = (x | (x << 1)) & 0x55555555L
      x
    }
    assert(z(9L) == spread(qy(9)) << 1)
    assert(z(13L) == spread(qy(13)) << 1)
  }

  test("zorderWrite: partitions cover disjoint compact z ranges") {
    val df = (0 until 400).map(i => (i.toLong % 20 * 3449, i.toLong / 20 * 3449))
      .toDF("x", "y")
    val parts = Layout.zorderWrite(df, 4, "x", "y")
      .select(spark_partition_id().as("p"), col("zorder"))
      .groupBy("p").agg(min("zorder").as("lo"), max("zorder").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(parts.length >= 2)
    parts.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping z ranges: $hi1 > $lo2")
    }
  }
}
