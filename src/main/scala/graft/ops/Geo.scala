package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F21/F22 — offline reverse geocoding + protected-coordinates masking
  * cascade (SURVEY §2.8, hard part 4).
  *
  * The reference calls Nominatim per row (create_sheets_TEST3.py:622-713);
  * the engine has no network, so the provider is a broadcast state
  * bounding-box dimension join — same output grammar
  * (`"{country}:{state}"`, `"not provided"` for invalid coords,
  * `"USA:California,"` trailing-comma fallback on a miss), deterministic,
  * and a narrow broadcast join at any scale. A network-backed provider
  * can be swapped in by replacing the bbox frame.
  */
object Geo {

  val HiddenMessage = "Precise location made hidden for sensitive species."

  /** Coarse state bounding boxes for the CCGP's geographic domain
    * (western US + a couple of controls). (state, latMin, latMax,
    * longMin, longMax) — derived from public USGS state extents. */
  val stateBoxes: Seq[(String, Double, Double, Double, Double)] = Seq(
    ("California", 32.53, 42.01, -124.48, -114.13),
    ("Oregon", 42.00, 46.30, -124.60, -116.46),
    ("Nevada", 35.00, 42.00, -120.01, -114.04),
    ("Arizona", 31.33, 37.00, -114.82, -109.04),
    ("Washington", 45.54, 49.00, -124.85, -116.92),
    ("Idaho", 42.00, 49.00, -117.24, -111.04),
    ("Utah", 37.00, 42.00, -114.05, -109.04),
    ("Texas", 25.84, 36.50, -106.65, -93.51))

  def bboxFrame(spark: SparkSession): DataFrame =
    spark.createDataFrame(stateBoxes)
      .toDF("state", "lat_min", "lat_max", "long_min", "long_max")

  /** F21 — offline reverse geocode: adds `geo_resolved` from (lat, long)
    * string columns. Invalid/NaN → "not provided"; bbox hit →
    * "USA:{state}"; miss → "USA:California," (reference fallback,
    * create_sheets_TEST3.py:694). Ambiguous overlaps resolve to the
    * first state in declaration order (deterministic). */
  def withReverseGeocode(df: DataFrame, latCol: String, longCol: String,
      out: String = "geo_resolved"): DataFrame = {
    val spark = df.sparkSession
    val lat = col(latCol).try_cast("double")
    val long = col(longCol).try_cast("double")
    val boxes = bboxFrame(spark)
      .withColumn("_prio", monotonically_increasing_id())
    val withCoords = df
      .withColumn("_glat", lat).withColumn("_glong", long)
    val hit = withCoords
      .join(broadcast(boxes),
        col("_glat").between(col("lat_min"), col("lat_max")) &&
          col("_glong").between(col("long_min"), col("long_max")),
        "left")
      .groupBy(withCoords.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
      .agg(min(struct(col("_prio"), col("state"))).as("_best"))
      .withColumn(out,
        when(col("_glat").isNull || col("_glong").isNull ||
          isnan(col("_glat")) || isnan(col("_glong")), lit("not provided"))
          .when(col("_best.state").isNotNull, concat(lit("USA:"), col("_best.state")))
          .otherwise(lit("USA:California,")))
      .drop("_glat", "_glong", "_best")
    hit
  }

  /** F22 — protected-coords masking cascade
    * (create_sheets_TEST3.py:424-500,573-607). Requires string columns
    * lat/long ("NaN" for missing), protected_coords/exclude
    * (TRUE/FALSE/null), township/range/section, geo_loc_name, and a
    * `geo_resolved` column from [[withReverseGeocode]]. Produces/updates
    * `lat_lon`, `geo_loc_name`, `description`. */
  def maskProtectedCoords(df: DataFrame): DataFrame = {
    val prot = coalesce(upper(col("protected_coords").cast("string")), lit(""))
    val excl = coalesce(upper(col("exclude").cast("string")), lit(""))
    val bothTrue = prot === "TRUE" && excl === "TRUE"
    val protOnly = prot === "TRUE" && excl === "FALSE"
    val open = (prot === "FALSE" && excl === "FALSE") ||
      (prot === "NAN" && excl === "NAN") || (prot === "" && excl === "")

    val latLonOpen = when(col("lat") === "NaN" && col("long") === "NaN", "not provided")
      .otherwise(concat_ws(",", col("lat"), col("long")))
    val trs = concat_ws("-", col("township"), col("range"), col("section"))
    val existing = col("geo_loc_name")
    val geoStr = col("geo_resolved")

    df
      .withColumn("lat_lon",
        when(bothTrue, lit("not provided"))
          .when(open, latLonOpen)
          .otherwise(lit(null).cast("string")))
      .withColumn("description",
        when(bothTrue || protOnly, lit(HiddenMessage)))
      .withColumn("geo_loc_name",
        when(protOnly, concat(geoStr, lit(", "), trs))
          .when(open && existing.isNotNull && existing =!= "" && geoStr =!= "not provided",
            when(existing === "missing", geoStr)
              .otherwise(concat(geoStr, lit(", "), existing)))
          .when(open, geoStr)
          .otherwise(existing))
  }
}
