package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, QueryGroup}
import graft.ops.Geo

/** F21/F22 — offline reverse geocode + protected-coords masking cascade
  * as oracle-checked queries (inline fixtures; DuckDB re-implements the
  * bbox join and the cascade independently). */
object GeoQueries extends QueryGroup {

  private def fixture(spark: SparkSession): DataFrame =
    spark.createDataFrame(Seq(
      ("s1", "36.0", "-119.0", "TRUE", "TRUE", "T1", "R1", "S1", "Near creek"),
      ("s2", "36.0", "-119.0", "TRUE", "FALSE", "T2", "R2", "S2", "Near creek"),
      ("s3", "36.0", "-119.0", "FALSE", "FALSE", "T3", "R3", "S3", "Near creek"),
      ("s4", "44.0", "-121.0", null, null, null, null, null, "missing"),
      ("s5", "NaN", "NaN", "", "", null, null, null, ""),
      ("s6", "51.0", "0.0", "FALSE", "FALSE", null, null, null, null)))
      .toDF("sample_name", "lat", "long", "protected_coords", "exclude",
        "township", "range", "section", "geo_loc_name")

  private val fixtureSql =
    """t(sample_name, lat, long, protected_coords, exclude,
      |  township, range, section, geo_loc_name) AS (VALUES
      |  ('s1', '36.0', '-119.0', 'TRUE', 'TRUE', 'T1', 'R1', 'S1', 'Near creek'),
      |  ('s2', '36.0', '-119.0', 'TRUE', 'FALSE', 'T2', 'R2', 'S2', 'Near creek'),
      |  ('s3', '36.0', '-119.0', 'FALSE', 'FALSE', 'T3', 'R3', 'S3', 'Near creek'),
      |  ('s4', '44.0', '-121.0', NULL, NULL, NULL, NULL, NULL, 'missing'),
      |  ('s5', 'NaN', 'NaN', '', '', NULL, NULL, NULL, ''),
      |  ('s6', '51.0', '0.0', 'FALSE', 'FALSE', NULL, NULL, NULL, NULL))""".stripMargin

  private val bboxSql = Geo.stateBoxes.zipWithIndex.map {
    case ((s, la, lb, lo, lc), i) => s"('$s', $la, $lb, $lo, $lc, $i)"
  }.mkString(
    "boxes(state, lat_min, lat_max, long_min, long_max, rn) AS (VALUES\n  ", ", ", ")")

  /** F21+F22 combined: resolve then mask. */
  def geoMask(spark: SparkSession, dir: String): DataFrame =
    Geo.maskProtectedCoords(
        Geo.withReverseGeocode(fixture(spark), "lat", "long"))
      .select($"sample_name", $"geo_resolved", $"lat_lon", $"geo_loc_name",
        $"description")
      .orderBy($"sample_name")

  private val geoMaskSql =
    s"""WITH $fixtureSql,
       |$bboxSql,
       |resolved AS (
       |  SELECT t.*, CASE
       |    WHEN TRY_CAST(t.lat AS DOUBLE) IS NULL OR TRY_CAST(t.long AS DOUBLE) IS NULL
       |         OR isnan(TRY_CAST(t.lat AS DOUBLE)) OR isnan(TRY_CAST(t.long AS DOUBLE))
       |      THEN 'not provided'
       |    WHEN b.state IS NOT NULL THEN 'USA:' || b.state
       |    ELSE 'USA:California,' END AS geo_resolved
       |  FROM t LEFT JOIN (
       |    SELECT tt.sample_name, arg_min(bb.state, bb.rn) AS state
       |    FROM t tt JOIN boxes bb
       |      ON TRY_CAST(tt.lat AS DOUBLE) BETWEEN bb.lat_min AND bb.lat_max
       |     AND TRY_CAST(tt.long AS DOUBLE) BETWEEN bb.long_min AND bb.long_max
       |    GROUP BY tt.sample_name) b
       |  ON t.sample_name = b.sample_name),
       |flags AS (
       |  SELECT *, coalesce(upper(protected_coords), '') AS p,
       |         coalesce(upper(exclude), '') AS e
       |  FROM resolved)
       |SELECT sample_name, geo_resolved,
       |  CASE WHEN p = 'TRUE' AND e = 'TRUE' THEN 'not provided'
       |       WHEN (p = 'FALSE' AND e = 'FALSE') OR (p = 'NAN' AND e = 'NAN')
       |            OR (p = '' AND e = '') THEN
       |         CASE WHEN lat = 'NaN' AND long = 'NaN' THEN 'not provided'
       |              ELSE lat || ',' || long END
       |  END AS lat_lon,
       |  CASE WHEN p = 'TRUE' AND e = 'FALSE' THEN
       |         geo_resolved || ', ' || concat_ws('-', township, range, section)
       |       WHEN ((p = 'FALSE' AND e = 'FALSE') OR (p = 'NAN' AND e = 'NAN')
       |             OR (p = '' AND e = ''))
       |            AND geo_loc_name IS NOT NULL AND geo_loc_name != ''
       |            AND geo_resolved != 'not provided' THEN
       |         CASE WHEN geo_loc_name = 'missing' THEN geo_resolved
       |              ELSE geo_resolved || ', ' || geo_loc_name END
       |       WHEN (p = 'FALSE' AND e = 'FALSE') OR (p = 'NAN' AND e = 'NAN')
       |            OR (p = '' AND e = '') THEN geo_resolved
       |       ELSE geo_loc_name END AS geo_loc_name,
       |  CASE WHEN p = 'TRUE' AND e IN ('TRUE', 'FALSE')
       |       THEN '${Geo.HiddenMessage}' END AS description
       |FROM flags ORDER BY sample_name""".stripMargin

  /** J22 — spatial radius join: customers × suppliers within 2° in a
    * deterministic md5-derived coordinate space (the derivation is part
    * of the query so any engine reproduces it). Grid-bucketed equi
    * join — never a nested loop (GeoSpec pins the plan); the oracle is
    * the naive cross-join filter. */
  def radiusJoinQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def coord(key: org.apache.spark.sql.Column, salt: String,
        span: Double, off: Double) =
      (pmod(conv(substring(md5(concat(key.cast("string"), lit(salt))
          .cast("binary")), 1, 8), 16, 10).cast("long"), lit(10000L))
        .cast("double") / lit(10000.0)) * lit(span) - lit(off)
    val cust = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"),
        coord(col("c_custkey"), "_lat", 140.0, 70.0).as("c_lat"),
        coord(col("c_custkey"), "_lon", 360.0, 180.0).as("c_lon"))
    val supp = graft.Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"),
        coord(col("s_suppkey"), "_slat", 140.0, 70.0).as("s_lat"),
        coord(col("s_suppkey"), "_slon", 360.0, 180.0).as("s_lon"))
    Geo.radiusJoin(cust, supp, "c_lat", "c_lon", "s_lat", "s_lon",
        radiusDeg = 2.0)
      .select(col("c_custkey"), col("s_suppkey"), col("dist2_q6"))
      .orderBy(col("c_custkey"), col("s_suppkey"))
  }

  private val radiusJoinSql =
    """WITH c AS (
      |  SELECT c_custkey,
      |    ((('0x' || substr(md5(c_custkey::VARCHAR || '_lat'), 1, 8))::BIGINT
      |      % 10000)::DOUBLE / 10000.0::DOUBLE) * 140.0::DOUBLE
      |      - 70.0::DOUBLE AS c_lat,
      |    ((('0x' || substr(md5(c_custkey::VARCHAR || '_lon'), 1, 8))::BIGINT
      |      % 10000)::DOUBLE / 10000.0::DOUBLE) * 360.0::DOUBLE
      |      - 180.0::DOUBLE AS c_lon
      |  FROM customer),
      |s AS (
      |  SELECT s_suppkey,
      |    ((('0x' || substr(md5(s_suppkey::VARCHAR || '_slat'), 1, 8))::BIGINT
      |      % 10000)::DOUBLE / 10000.0::DOUBLE) * 140.0::DOUBLE
      |      - 70.0::DOUBLE AS s_lat,
      |    ((('0x' || substr(md5(s_suppkey::VARCHAR || '_slon'), 1, 8))::BIGINT
      |      % 10000)::DOUBLE / 10000.0::DOUBLE) * 360.0::DOUBLE
      |      - 180.0::DOUBLE AS s_lon
      |  FROM supplier)
      |SELECT c.c_custkey, s.s_suppkey,
      |  floor(((c.c_lat - s.s_lat) * (c.c_lat - s.s_lat)
      |         + (c.c_lon - s.s_lon) * (c.c_lon - s.s_lon))
      |        * 1000000.0::DOUBLE)::BIGINT AS dist2_q6
      |FROM c CROSS JOIN s
      |WHERE (c.c_lat - s.s_lat) * (c.c_lat - s.s_lat)
      |      + (c.c_lon - s.s_lon) * (c.c_lon - s.s_lon)
      |      <= 2.0::DOUBLE * 2.0::DOUBLE
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("f21_geo_mask", geoMask, Some(geoMaskSql)),
    QueryDef("j22_radius_join", radiusJoinQ, Some(radiusJoinSql)))
}
