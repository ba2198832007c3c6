package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loaders. */
object Tables {

  // Memoized per (session, dir, name): every `spark.read.parquet` call
  // re-lists the directory and re-reads a footer for schema inference —
  // 50–150 ms of driver work PER QUERY that the 129-query suite pays
  // hundreds of times for the same ten immutable inputs. The cached
  // DataFrame is an immutable logical plan; the session in the key
  // scopes it (a new session must not see another session's relations).
  // Contract: the input tables are immutable within a process — which
  // holds for the testdata dirs (run-scoped scratch paths are read
  // directly, never through here).
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // evict stopped sessions' entries: their relations are unusable and
    // would otherwise pin each stopped session (and its file indexes)
    // for the JVM lifetime — test JVMs run many sessions
    val it = cache.keySet.iterator
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    cache.computeIfAbsent((s, dir, name),
      _ => s.read.parquet(s"$dir/$name.parquet"))
  }

  /** Drop every cached relation under `dir` — the enforcement hook for
    * the immutability contract above. A caller that rewrites an input
    * directory in-process MUST invalidate it, or later [[table]] calls
    * are served the first read's pinned file listing (stale rows, or
    * FileNotFound after a rewrite that renamed files). */
  def invalidate(dir: String): Unit = {
    val it = cache.keySet.iterator
    while (it.hasNext) if (it.next()._2 == dir) it.remove()
  }

  /** Single-file parquet inputs arrive with as few partitions as the
    * file has row groups (1–2 at bench scale), which serializes every
    * downstream map stage onto one or two cores. Widen to the session's
    * parallelism when the source is under-partitioned; well-partitioned
    * inputs (the 100 TB case: many files / row groups) pass through
    * untouched. The round-robin exchange moves only the NARROW source
    * rows — worth it when a fan-out (triple explode, signature math)
    * multiplies work per row downstream.
    *
    * The under-partitioning estimate runs ONLY on shuffle-free plans
    * (plans with exchanges already carry ~shuffle.partitions partitions,
    * so widening is moot) and reads the scan's ALREADY-LISTED file
    * statistics — replicating Spark's own split-packing formula
    * (maxSplitBytes = min(maxPartitionBytes, max(openCost,
    * total/parallelism))) — instead of probing `df.rdd`, which forces
    * physical planning + codegen + RDD DAG construction on the driver
    * for every composed query. Non-file leaves (in-memory relations,
    * which are tiny) fall back to the RDD probe. */
  def widen(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val shuffleBearing = df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Distinct | _: Deduplicate |
           _: Window | _: Sort | _: RepartitionOperation => true
      case _ => false
    }
    if (shuffleBearing) df
    else {
      val spark = df.sparkSession
      val target = spark.sparkContext.defaultParallelism
      val conf = spark.sessionState.conf
      val openCost = conf.filesOpenCostInBytes
      val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      val fileBytes: Seq[Option[Seq[Long]]] = leaves.map {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location match {
            // per-file lengths (already listed) let us replicate Spark's
            // own padded packing — the total alone under-counts a
            // many-small-files scan, which is ALREADY parallel and must
            // not get a useless round-robin exchange
            case p: org.apache.spark.sql.execution.datasources
                      .PartitioningAwareFileIndex =>
              Some(p.allFiles().map(_.getLen))
            case other => Some(Seq(other.sizeInBytes))
          }
        case _ => None
      }
      if (fileBytes.nonEmpty && fileBytes.forall(_.isDefined)) {
        val padded = fileBytes.flatten.flatten.map(_ + openCost)
        val total = padded.sum
        val maxSplit = math.min(conf.filesMaxPartitionBytes,
          math.max(openCost, total / math.max(target, 1)))
        val estPartitions = math.ceil(total.toDouble / math.max(maxSplit, 1)).toLong
        if (estPartitions < target) df.repartition(target) else df
      } else if (df.rdd.getNumPartitions < target) df.repartition(target)
      else df
    }
  }

  /** Normalize an event-time column to session-TZ `timestamp`
    * (microsecond precision), whatever vintage of testdata produced it.
    * The events table has shipped as parquet TIMESTAMP(NANOS) — which
    * Spark reads only as `long` under `legacy.parquet.nanosAsLong` — and
    * as TIMESTAMP(MICROS), which loads as TIMESTAMP or TIMESTAMP_NTZ
    * depending on isAdjustedToUTC. Dispatch on the LOADED type so the
    * loader survives either vintage:
    *  - LongType (legacy nanos-as-long): integer-`div` to micros, then
    *    `timestamp_micros`. `div` not `/`: nanos ≈ 1.7e18 exceed
    *    double's 2^53 mantissa, a `/`-based conversion would corrupt.
    *  - TIMESTAMP_NTZ: cast to session-TZ timestamp — value-preserving
    *    because the session TZ is pinned to UTC.
    *  - TIMESTAMP: already what every query expects; pass through. */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case _: TimestampNTZType => df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _: TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.$tsCol has unsupported type $other — expected long (nanos), timestamp_ntz, or timestamp")
    }
  }

  /** Events table, with `ts` normalized to session-TZ timestamp (see
    * [[normalizeTs]]). NOT widened: the per-row map work of the events
    * queries (date dispatch, regex extraction) is too cheap for a
    * round-robin exchange to pay for itself (measured: widening REGRESSES
    * q14/q16/q17 at sf0.1) — [[widen]] stays reserved for scans feeding
    * heavy fan-out (triple explode, signature math). The nanosAsLong
    * conf is a no-op for MICROS files but required to read the NANOS
    * vintage at all. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, dir, "events"))
  }
}
