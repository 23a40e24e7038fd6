package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryGroup, Tables}
import graft.functions.CleaningFunctions._

/** Cleansing scalar functions F1–F27 (SURVEY.md §2.8), each checked
  * against a DuckDB oracle. Functions whose inputs don't exist in the
  * driver tables run over inline literal fixtures mirrored as VALUES
  * clauses in the oracle SQL — same rows, same expressions, real
  * hash-checked parity. All functions are pure Catalyst expressions
  * (whole-stage codegen; zero UDF overhead at scale).
  */
object FunctionQueries extends QueryGroup {

  import Tables.load

  private def fixture(spark: SparkSession, rows: Seq[(Int, String)], valueCol: String): DataFrame =
    spark.createDataFrame(rows).toDF("id", valueCol)

  /** F1+F4 — split_lat/split_long + hemisphere normalization
    * (parse.py:16-39,86-105). */
  def coordClean(spark: SparkSession, dir: String): DataFrame = {
    val df = fixture(spark, Seq(
      1 -> "32.11,128.11",
      2 -> "38.05104 N 120.62301 W",
      3 -> "32.11_128.11",
      4 -> "45.2,-120.9",
      5 -> "bogus"), "lat_lon")
    df.select($"id",
        round(checkLat(splitLat($"lat_lon")), 6).as("lat"),
        round(checkLong(splitLong($"lat_lon")), 6).as("long"))
      .orderBy($"id")
  }

  private val coordCleanSql =
    """WITH t(id, lat_lon) AS (VALUES
      |  (1, '32.11,128.11'), (2, '38.05104 N 120.62301 W'),
      |  (3, '32.11_128.11'), (4, '45.2,-120.9'), (5, 'bogus')),
      |s AS (SELECT id, regexp_replace(lat_lon, '[A-Za-z]', '', 'g') AS c FROM t),
      |sp AS (SELECT id,
      |  CASE WHEN len(string_split(c, ',')) = 2 THEN string_split(c, ',')[1]
      |       WHEN len(string_split(c, ' ')) = 4 THEN string_split(c, ' ')[1]
      |       WHEN len(string_split(c, '_')) = 2 THEN string_split(c, '_')[1] END AS rawlat,
      |  CASE WHEN len(string_split(c, ',')) = 2 THEN string_split(c, ',')[2]
      |       WHEN len(string_split(c, ' ')) = 4 THEN string_split(c, ' ')[3]
      |       WHEN len(string_split(c, '_')) = 2 THEN string_split(c, '_')[2] END AS rawlong
      |  FROM s)
      |SELECT id, round(abs(CAST(rawlat AS DOUBLE)), 6) AS lat,
      |       round(-abs(CAST(rawlong AS DOUBLE)), 6) AS long
      |FROM sp ORDER BY id""".stripMargin

  /** F2 — dms2dd (parse.py:43-69). */
  def dmsParse(spark: SparkSession, dir: String): DataFrame = {
    val df = fixture(spark, Seq(
      1 -> "0°51'56.29\"S",
      2 -> "33°51'N",
      3 -> "12°xx'yy\"N",
      4 -> "45.5",
      5 -> "117°8'34.9\"W"), "dms")
    df.select($"id", round(dms2dd($"dms"), 6).as("dd")).orderBy($"id")
  }

  private val dmsParseSql =
    """WITH t(id, dms) AS (VALUES
      |  (1, '0°51''56.29"S'), (2, '33°51''N'), (3, '12°xx''yy"N'),
      |  (4, '45.5'), (5, '117°8''34.9"W')),
      |p AS (SELECT id, dms, string_split_regex(dms, '[°''"]+') AS parts FROM t)
      |SELECT id, round(CASE
      |  WHEN regexp_matches(dms, '[°''"]') THEN
      |    CASE WHEN len(parts) = 4 THEN coalesce(
      |           (TRY_CAST(parts[1] AS DOUBLE) + TRY_CAST(parts[2] AS DOUBLE)/60
      |            + TRY_CAST(parts[3] AS DOUBLE)/3600)
      |           * (CASE WHEN parts[4] IN ('S','W') THEN -1 ELSE 1 END), 0)
      |         WHEN len(parts) = 3 THEN coalesce(
      |           (TRY_CAST(parts[1] AS DOUBLE) + TRY_CAST(parts[2] AS DOUBLE)/60)
      |           * (CASE WHEN parts[3] IN ('S','W') THEN -1 ELSE 1 END), 0)
      |    END
      |  ELSE TRY_CAST(dms AS DOUBLE) END, 6) AS dd
      |FROM p ORDER BY id""".stripMargin

  /** F3 — check_date (parse.py:72-83). */
  def dateClean(spark: SparkSession, dir: String): DataFrame = {
    val df = fixture(spark, Seq(
      1 -> "2020,2021",
      2 -> "3/7/2021",
      3 -> "2021-05-06",
      4 -> "11/25/1999",
      5 -> "garbage"), "d")
    df.select($"id", checkDate($"d").as("date_norm")).orderBy($"id")
  }

  private val dateCleanSql =
    """WITH t(id, d) AS (VALUES
      |  (1, '2020,2021'), (2, '3/7/2021'), (3, '2021-05-06'),
      |  (4, '11/25/1999'), (5, 'garbage'))
      |SELECT id, CASE
      |  WHEN len(string_split(d, ',')) = 2 THEN
      |    string_split(d, ',')[1] || '/' || string_split(d, ',')[2]
      |  WHEN len(string_split(d, '/')) = 3 THEN
      |    string_split(d, '/')[3] || '-' || lpad(string_split(d, '/')[1], 2, '0')
      |    || '-' || lpad(string_split(d, '/')[2], 2, '0')
      |  ELSE d END AS date_norm
      |FROM t ORDER BY id""".stripMargin

  /** F5+F6 — name normalization + blank→null (parse.py:275-289,
    * gsheets.py:21-23). */
  def nameNorm(spark: SparkSession, dir: String): DataFrame = {
    val df = fixture(spark, Seq(
      1 -> "So.me Na me",
      2 -> "   ",
      3 -> "CC131_SelS",
      4 -> "a.b.c d"), "name")
    df.select($"id",
        normalizeName($"name").as("name_norm"),
        blankToNull($"name").as("blanked"))
      .orderBy($"id")
  }

  private val nameNormSql =
    """WITH t(id, name) AS (VALUES
      |  (1, 'So.me Na me'), (2, '   '), (3, 'CC131_SelS'), (4, 'a.b.c d'))
      |SELECT id, translate(name, '. ', '__') AS name_norm,
      |       CASE WHEN trim(name) = '' THEN NULL ELSE name END AS blanked
      |FROM t ORDER BY id""".stripMargin

  /** F7+F8+F9+F11 — library id, pair prefix, title, isolate
    * (create_sheets.py:31-58,188-192). */
  def composeFields(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.createDataFrame(Seq(
      (1, "CC131_SelS_S1_L001_R1_001.fastq.gz", "Sceloporus occidentalis", "CC131"),
      (2, "samp2_R2.fastq.gz", "Genus species", "s2"),
      (3, "noreadmarker.fastq.gz", "One two", "s3")))
      .toDF("id", "file", "organism", "sample")
    df.select($"id",
        libraryId($"file").as("library_id"),
        pairPrefix($"file").as("prefix"),
        wgsTitle($"organism").as("title"),
        isolate($"organism", $"sample").as("isolate"))
      .orderBy($"id")
  }

  private val composeFieldsSql =
    """WITH t(id, file, organism, sample) AS (VALUES
      |  (1, 'CC131_SelS_S1_L001_R1_001.fastq.gz', 'Sceloporus occidentalis', 'CC131'),
      |  (2, 'samp2_R2.fastq.gz', 'Genus species', 's2'),
      |  (3, 'noreadmarker.fastq.gz', 'One two', 's3'))
      |SELECT id,
      |  string_split(file, '_R1')[1] AS library_id,
      |  CASE WHEN regexp_matches(file, '_R\d[._]')
      |       THEN regexp_extract(file, '^(.*?)_R\d[._]', 1) ELSE file END AS prefix,
      |  'Whole genome sequencing of ' || organism AS title,
      |  replace(organism, ' ', '_') || '_' || sample AS isolate
      |FROM t ORDER BY id""".stripMargin

  /** F10+F16 — lat_lon compose with "not provided" rule + placeholder
    * substitution + dequote (create_sheets.py:90-97,186; TEST3:471-474). */
  def composeLatLon(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.createDataFrame(Seq(
      (1, "32.11", "-120.5", "ACC_001", " \"q\" "),
      (2, "NaN", "NaN", "NaN", "\"x\""),
      (3, "0.0", "0.0", null, "plain")))
      .toDF("id", "lat", "long", "acc", "q")
    df.select($"id",
        latLonCompose($"lat", $"long").as("lat_lon"),
        refGenomePlaceholder($"acc").as("ref_acc"),
        dequote($"q").as("dq"))
      .orderBy($"id")
  }

  private val composeLatLonSql =
    """WITH t(id, lat, long, acc, q) AS (VALUES
      |  (1, '32.11', '-120.5', 'ACC_001', ' "q" '),
      |  (2, 'NaN', 'NaN', 'NaN', '"x"'),
      |  (3, '0.0', '0.0', NULL, 'plain'))
      |SELECT id,
      |  CASE WHEN lat || ',' || long = 'NaN,NaN' THEN 'not provided'
      |       ELSE lat || ',' || long END AS lat_lon,
      |  CASE WHEN acc IS NULL OR acc = 'NaN' THEN 'refGenomePlaceholder'
      |       ELSE acc END AS ref_acc,
      |  trim(replace(q, '"', '')) AS dq
      |FROM t ORDER BY id""".stripMargin

  /** F14+F15 — geo_loc_name precedence cascade + title fallback
    * (create_sheets_TEST3.py:269-296). */
  def geoCascade(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.createDataFrame(Seq(
      (1, "USA: California", "Near creek", "Marin", "California"),
      (2, null, "Near creek", "Marin", "California"),
      (3, null, null, null, "Oregon"),
      (4, "", "Desert site", null, null),
      (5, null, null, null, null)))
      .toDF("id", "geo_loc", "locality", "county", "state")
    df.select($"id",
        geoLocCascade($"geo_loc", $"locality", $"county", $"state").as("geo_loc_name"))
      .orderBy($"id")
  }

  private val geoCascadeSql =
    """WITH t(id, geo_loc, locality, county, state) AS (VALUES
      |  (1, 'USA: California', 'Near creek', 'Marin', 'California'),
      |  (2, NULL, 'Near creek', 'Marin', 'California'),
      |  (3, NULL, NULL, NULL, 'Oregon'),
      |  (4, '', 'Desert site', NULL, NULL),
      |  (5, NULL, NULL, NULL, NULL))
      |SELECT id, CASE
      |  WHEN geo_loc IS NOT NULL AND trim(geo_loc) != '' THEN geo_loc
      |  WHEN state IS NOT NULL AND county IS NOT NULL THEN 'USA: ' || state || ': ' || county
      |  WHEN state IS NOT NULL THEN 'USA: ' || state
      |  WHEN locality IS NOT NULL AND trim(locality) != '' THEN locality
      |  ELSE 'missing' END AS geo_loc_name
      |FROM t ORDER BY id""".stripMargin

  /** F17+F18 — YES/NO gate + TRUE/FALSE bool (update_reads.py:215-221,
    * coordinate_assign_1.py:40-43). */
  def flagNorm(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.createDataFrame(Seq(
      (1, "YES", "TRUE"), (2, "NO", "FALSE"), (3, "yes", "true"),
      (4, null, null), (5, "maybe", "0")))
      .toDF("id", "yn", "tf")
    df.select($"id",
        yesNoGate($"yn").as("gate"),
        boolUpper($"tf").as("flag"))
      .orderBy($"id")
  }

  private val flagNormSql =
    """WITH t(id, yn, tf) AS (VALUES
      |  (1, 'YES', 'TRUE'), (2, 'NO', 'FALSE'), (3, 'yes', 'true'),
      |  (4, NULL, NULL), (5, 'maybe', '0'))
      |SELECT id, CASE WHEN upper(yn) = 'YES' THEN 1 END AS gate,
      |       upper(tf) = 'TRUE' AS flag
      |FROM t ORDER BY id""".stripMargin

  /** F19+F20 — expected-reads / depth / terabyte math
    * (variance_files.py:115-121, parse.py:314) over real aggregates. */
  def depthMath(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .groupBy($"l_returnflag".as("flag"))
      .agg(
        round(sum($"l_extendedprice") * ReadsPerByte).as("expected_reads"),
        round(sum($"l_extendedprice") / 1e12, 8).as("tb"),
        round(round(sum($"l_extendedprice") * ReadsPerByte) * 150 / 2.5e9, 3).as("depth"))
      .orderBy($"flag")

  private val depthMathSql =
    s"""SELECT l_returnflag AS flag,
       |  round(sum(l_extendedprice) * $ReadsPerByte) AS expected_reads,
       |  round(sum(l_extendedprice) / 1e12, 8) AS tb,
       |  round(round(sum(l_extendedprice) * $ReadsPerByte) * 150 / 2.5e9, 3) AS depth
       |FROM lineitem GROUP BY l_returnflag ORDER BY flag""".stripMargin

  /** F23 — regex batch extraction (batch_extract.py:4-9 shape) over the
    * documents source column. */
  def batchExtractQ(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select($"doc_id", regexp_extract($"source", "src(\\d+)", 1).as("src_num"))
      .orderBy($"doc_id")

  private val batchExtractSql =
    """SELECT doc_id, regexp_extract(source, 'src(\d+)', 1) AS src_num
      |FROM documents ORDER BY doc_id""".stripMargin

  /** F25 — one-level JSON flatten (json_normalize, update_gsheet.py:14)
    * over the events props column. */
  def jsonFlatten(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .orderBy($"event_id")

  private val jsonFlattenSql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** F26+F27 — comma multi-id split + separator-variant generation
    * (update_reads.py:78,92-126). */
  def idVariantsQ(spark: SparkSession, dir: String): DataFrame = {
    val df = fixture(spark, Seq(
      1 -> "AB_1,AB-2",
      2 -> "CC131-SelS",
      3 -> "plain"), "ids")
    df.select($"id", explode(commaIds($"ids")).as("one_id"))
      .select($"id", $"one_id", explode(idVariants($"one_id")).as("variant"))
      .orderBy($"id", $"one_id", $"variant")
  }

  private val idVariantsSql =
    """WITH t(id, ids) AS (VALUES
      |  (1, 'AB_1,AB-2'), (2, 'CC131-SelS'), (3, 'plain')),
      |o AS (SELECT id, unnest(string_split(ids, ',')) AS one_id FROM t),
      |v AS (SELECT id, one_id, unnest(list_distinct([one_id,
      |         replace(one_id, '_', '-'), replace(one_id, '-', ''),
      |         replace(one_id, '-', '_')])) AS variant FROM o)
      |SELECT id, one_id, variant FROM v ORDER BY id, one_id, variant""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("f1_coord_clean", coordClean, Some(coordCleanSql)),
    QueryDef("f2_dms_parse", dmsParse, Some(dmsParseSql)),
    QueryDef("f3_date_clean", dateClean, Some(dateCleanSql)),
    QueryDef("f5_name_norm", nameNorm, Some(nameNormSql)),
    QueryDef("f7_compose_fields", composeFields, Some(composeFieldsSql)),
    QueryDef("f10_compose_latlon", composeLatLon, Some(composeLatLonSql)),
    QueryDef("f14_geo_cascade", geoCascade, Some(geoCascadeSql)),
    QueryDef("f17_flag_norm", flagNorm, Some(flagNormSql)),
    QueryDef("f19_depth_math", depthMath, Some(depthMathSql)),
    QueryDef("f23_batch_extract", batchExtractQ, Some(batchExtractSql)),
    QueryDef("f25_json_flatten", jsonFlatten, Some(jsonFlattenSql)),
    QueryDef("f26_id_variants", idVariantsQ, Some(idVariantsSql)))
}
