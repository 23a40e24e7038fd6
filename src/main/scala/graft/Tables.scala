package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central access to the driver-generated test tables (TESTDATA.md).
  *
  * Every [[SparkEntry.queries]] entry receives `(spark, sfDir)` and resolves
  * tables through here, so the scan is always a parquet scan Catalyst can
  * push filters/projections into.  At 100 TB these would be partitioned /
  * bucketed catalog tables; the access path (named table -> DataFrame) is
  * the same.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Deterministic spread keys for [[loadWide]]'s small-scan widening —
    * unique per table, so a hash repartition spreads evenly and
    * reproduces identically under task retries (guide §2.5: never
    * round-robin on rand-derived keys). */
  private val spreadKeys: Map[String, Seq[String]] = Map(
    "documents" -> Seq("doc_id"))

  /** EXPLICIT opt-in scan widening for the handful of operators whose
    * downstream per-row work dwarfs the scan (document tokenization
    * cascades: phrase search, skip-grams, winnowing, Pareto/budget
    * scoring). At bench SFs each table is ONE parquet file with ONE
    * row group, so the whole cascade fuses into a single task; the
    * repartition spreads it to the session's shuffle width (guide §2.5
    * "input skew: one huge unsplittable file … repartition immediately
    * after the read"). r12 applied this widening inside [[load]] to
    * EVERY fact-table consumer and regressed the 32-core bench ~29%
    * (a full-table Exchange taxes every light scan-filter-project
    * query); r13 reverts that and keeps the widening only at the call
    * sites where it measurably pays. At production scale tables arrive
    * as many files/row groups, the parallelism condition is false, and
    * no exchange is added. */
  def loadWide(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val df = load(spark, sfDir, name)
    val keys = spreadKeys.getOrElse(name,
      sys.error(s"no spread keys declared for table $name"))
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions * 4 < target)
      df.repartition(target, keys.map(col): _*)
    else df
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has been generated as both TIMESTAMP(NANOS) (which
      // Spark's vectorized reader rejects without the legacy long
      // fallback) and plain timestamp[us]; branch on what the footer
      // actually decodes to instead of hard-coding one generation.
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      (raw.schema("ts").dataType match {
        case LongType =>
          // TIMESTAMP(NANOS) read as raw int64 nanos: truncate to micros
          // (same truncation DuckDB applies casting TIMESTAMP_NS->TIMESTAMP).
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // session timezone is pinned to UTC everywhere (LocalSession /
          // test fixtures), so this cast is value-identical and keeps a
          // single downstream type for window/asof/range arithmetic.
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      })
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Small dimensions that should always be broadcast when joined. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part")
}

/** One declared engine operator: the Spark implementation plus (optionally)
  * the equivalent DuckDB SQL the driver uses as a correctness oracle.
  * Column names/aliases MUST match between the two (driver sorts columns by
  * name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def defs: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  final def oracles: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
