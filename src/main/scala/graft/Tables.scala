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

  /** Deterministic spread keys for [[load]]'s small-scan widening —
    * unique (or near-unique) per table, so a hash repartition spreads
    * evenly and reproduces identically under task retries (guide §2.5:
    * never round-robin on rand-derived keys). Dimensions that always
    * broadcast are deliberately absent. */
  private val spreadKeys: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    // "events" -> Seq("event_id"),  // TEMP A/B
    "documents" -> Seq("doc_id"),
    // "embeddings" -> Seq("vec_id")  // TEMP A/B
    )

  /** Widen a scan whose planned parallelism is far below the session's
    * shuffle width (guide §2.5 "input skew: one huge unsplittable file
    * … repartition immediately after the read"). At bench SFs each
    * table is ONE parquet file with ONE row group, so Spark's
    * 4 MB open-cost floor plans the whole scan — and everything fused
    * above it (tokenization cascades, per-row kernels) — into a single
    * task; at production scale tables arrive as many files/row groups,
    * the condition is false, and no exchange is added. Deterministic
    * hash keys, never round-robin (retry-safety, guide §2.5). */
  private def spread(spark: SparkSession, name: String,
      df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    spreadKeys.get(name) match {
      case Some(keys) =>
        val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
        if (df.rdd.getNumPartitions * 4 < target)
          df.repartition(target, keys.map(col): _*)
        else df
      case None => df
    }
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
      spread(spark, name, raw.schema("ts").dataType match {
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
      spread(spark, name, spark.read.parquet(s"$sfDir/$name.parquet"))
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
