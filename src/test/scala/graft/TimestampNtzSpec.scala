package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TIMESTAMP_NTZ hardening sweep: every timestamp entry point must
  * accept a session-zone-free input and (UTC test session) produce the
  * SAME answer as the session-zoned twin — the asofJoinStream contract
  * extended to the Resample grids, Journeys windows, and the streaming
  * window aggregation. Parquet written by other engines routinely
  * carries isAdjustedToUTC=false (→ NTZ on read), so "NTZ in, same
  * answer out" is a real ingestion path, not a corner case. */
class TimestampNtzSpec extends SparkSpec {

  import spark.implicits._

  // three users, bursts and gaps, duplicate-ts rows, value series
  private val rows: Seq[(Long, Long, String, String, Double)] = {
    val rnd = new scala.util.Random(7)
    (1L to 120L).map { i =>
      val user = i % 3
      val ts = s"2024-01-0${1 + (i % 5)} 0${rnd.nextInt(9)}:0${rnd.nextInt(6)}:1${i % 5}"
      val typ = Seq("view", "click", "purchase")(rnd.nextInt(3))
      (i, user, ts, typ, rnd.nextInt(1000) / 10.0)
    }
  }

  private def frame(ntz: Boolean): DataFrame = {
    val conv = if (ntz) "to_timestamp_ntz(t)" else "to_timestamp(t)"
    rows.toDF("event_id", "user_id", "t", "event_type", "value")
      .withColumn("ts", expr(conv)).drop("t")
  }
  private lazy val zoned = frame(ntz = false)
  private lazy val unzoned = frame(ntz = true)

  /** Canonical comparison: timestamps → micros so the differing output
    * TYPE (ntz propagates) never masks equal instants. */
  private def canon(df: DataFrame): Set[Seq[Any]] = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          unix_micros(col(f.name).cast("timestamp")).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*).collect().map(_.toSeq).toSet
  }

  private def assertSame(f: DataFrame => DataFrame, label: String): Unit = {
    assert(canon(f(unzoned)) === canon(f(zoned)), s"$label diverges on NTZ input")
  }

  test("Journeys windows accept NTZ: sessions, activeTime, rollingActives, " +
      "weekOverWeek, rfm, streaks, transitions") {
    assertSame(graft.ops.Journeys.sessions(_, gapSeconds = 1800L), "sessions")
    assertSame(graft.ops.Journeys.activeTime(_), "activeTime")
    assertSame(graft.ops.Journeys.rollingActives(_), "rollingActives")
    assertSame(graft.ops.Journeys.weekOverWeek(_), "weekOverWeek")
    assertSame(graft.ops.Journeys.rfm(_), "rfm")
    assertSame(graft.ops.Journeys.streaks(_), "streaks")
    assertSame(graft.ops.Journeys.transitions(_), "transitions")
  }

  test("Resample grids accept NTZ: gapFill, interpolate, timeWeightedAvg, " +
      "ewma, autocorrelation, theilSen") {
    assertSame(graft.ops.Resample.gapFill(_, bucketSeconds = 3600L), "gapFill")
    assertSame(graft.ops.Resample.interpolate(_, bucketSeconds = 3600L), "interpolate")
    assertSame(graft.ops.Resample.timeWeightedAvg(_), "timeWeightedAvg")
    assertSame(graft.ops.Resample.ewma(_), "ewma")
    assertSame(graft.ops.Resample.autocorrelation(_), "autocorrelation")
    assertSame(graft.ops.Resample.theilSen(_), "theilSen")
  }

  test("as-of and range joins accept NTZ: asofBackward, asofNearest, " +
      "pointInInterval, intervalOverlap") {
    def asofB(df: DataFrame) = graft.ops.AsofJoin.asofBackward(
      df.select($"event_id", $"user_id", $"ts"),
      df.where($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value"),
      Seq("user_id"), "ts")
    def asofN(df: DataFrame) = graft.ops.AsofJoin.asofNearest(
      df.select($"event_id", $"user_id", $"ts"),
      df.where($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value"),
      Seq("user_id"), "ts", maxGapSeconds = 7200L)
    def pii(df: DataFrame) = graft.ops.RangeJoin.pointInInterval(
      df.select($"event_id".as("pid"), $"ts".as("pt")),
      df.where($"event_type" === "click")
        .select($"event_id".as("iid"), $"ts".as("ivs"),
          expr("ts + INTERVAL 2 HOURS").as("ive")),
      "pt", "ivs", "ive")
    def iov(df: DataFrame) = graft.ops.RangeJoin.intervalOverlap(
      df.where($"user_id" === 0)
        .select($"event_id".as("la"), $"ts".as("ls"),
          expr("ts + INTERVAL 1 HOUR").as("le")),
      df.where($"user_id" === 1)
        .select($"event_id".as("ra"), $"ts".as("rs"),
          expr("ts + INTERVAL 1 HOUR").as("re")),
      "ls", "le", "rs", "re")
    assertSame(asofB, "asofBackward")
    assertSame(asofN, "asofNearest")
    assertSame(pii, "pointInInterval")
    assertSame(iov, "intervalOverlap")
    // a non-timestamp ts column fails loudly, never a silent reinterpret
    val e = intercept[IllegalArgumentException] {
      graft.ops.RangeJoin.pointInInterval(
        unzoned.select($"event_id".as("pid"), unix_micros($"ts".cast("timestamp")).as("pt")),
        unzoned.select($"event_id".as("iid"), $"ts".as("ivs"),
          expr("ts + INTERVAL 2 HOURS").as("ive")),
        "pt", "ivs", "ive")
    }
    assert(e.getMessage.contains("TIMESTAMP"))
  }

  test("streaming window aggregation accepts NTZ (st* shape): tumbling " +
      "counts equal the zoned batch twin") {
    // the batch twin of arrivalCounts' windowed groupBy
    def agg(df: DataFrame): DataFrame = df
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
    assertSame(agg, "tumbling window agg")
  }
}
