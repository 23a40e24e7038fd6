package graft

import org.apache.spark.sql.functions._
import graft.functions.CleaningFunctions._
import graft.functions.CustomExpressions

/** Table-driven cases lifted from the reference's literal examples
  * (parse.py:22,45) plus property checks (SURVEY §5.2). */
class CleaningFunctionsSpec extends SparkSpec {

  // seeded manual property loops (scalatest/scalacheck bridge not in the
  // offline cache; determinism is better for golden repro anyway)
  private val rnd = new scala.util.Random(42)

  import spark.implicits._

  private def evalStr(c: org.apache.spark.sql.Column, input: String): Option[String] = {
    val r = Seq(Tuple1(input)).toDF("v").select(c.cast("string").as("r")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }
  private def evalDouble(c: org.apache.spark.sql.Column, input: String): Option[Double] = {
    val r = Seq(Tuple1(input)).toDF("v").select(c.cast("double").as("r")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("split_lat/split_long: the reference's three formats (parse.py:16-39)") {
    assert(evalStr(splitLat(col("v")), "32.11,128.11") === Some("32.11"))
    assert(evalStr(splitLong(col("v")), "32.11,128.11") === Some("128.11"))
    assert(evalStr(splitLat(col("v")), "38.05104 N 120.62301 W") === Some("38.05104"))
    assert(evalStr(splitLong(col("v")), "38.05104 N 120.62301 W") === Some("120.62301"))
    assert(evalStr(splitLat(col("v")), "32.11_128.11") === Some("32.11"))
    assert(evalStr(splitLong(col("v")), "32.11_128.11") === Some("128.11"))
    assert(evalStr(splitLat(col("v")), "no coords here at all") === None)
  }

  test("dms2dd: reference example 0°51'56.29\"S (parse.py:45)") {
    val expected = -(0.0 + 51.0 / 60 + 56.29 / 3600)
    assert(math.abs(evalDouble(dms2dd(col("v")), "0°51'56.29\"S").get - expected) < 1e-9)
    // 3-part variant
    assert(math.abs(evalDouble(dms2dd(col("v")), "33°51'N").get - (33 + 51.0 / 60)) < 1e-9)
    // malformed numerics -> 0 (ValueError path)
    assert(evalDouble(dms2dd(col("v")), "12°xx'yy\"N") === Some(0.0))
    // non-DMS numeric passthrough
    assert(evalDouble(dms2dd(col("v")), "45.5") === Some(45.5))
  }

  test("DmsToDecimal expression matches the Column implementation on DMS inputs") {
    val inputs = Seq("0°51'56.29\"S", "33°51'N", "12°xx'yy\"N", "117°8'34.9\"W", "45.5")
    inputs.foreach { s =>
      val viaColumn = evalDouble(dms2dd(col("v")), s)
      val viaExpr = evalDouble(CustomExpressions.dms_to_decimal(col("v")), s)
      assert(viaColumn === viaExpr, s"mismatch for $s")
    }
  }

  test("check_date: year-pair, M/D/Y, passthrough (parse.py:72-83)") {
    assert(evalStr(checkDate(col("v")), "2020,2021") === Some("2020/2021"))
    assert(evalStr(checkDate(col("v")), "3/7/2021") === Some("2021-03-07"))
    assert(evalStr(checkDate(col("v")), "11/25/1999") === Some("1999-11-25"))
    assert(evalStr(checkDate(col("v")), "2021-05-06") === Some("2021-05-06"))
  }

  test("check_lat >= 0 and check_long <= 0 for all doubles (sign laws)") {
    val samples = Seq(0.0, -0.0, 1.5, -89.9, 180.0, -179.99) ++
      Seq.fill(20)(rnd.nextDouble() * 360 - 180)
    samples.foreach { d =>
      val lat = evalDouble(checkLat(lit(d)), "x").get
      val long = evalDouble(checkLong(lit(d)), "x").get
      assert(lat >= 0.0 && long <= 0.0)
      assert(math.abs(lat) === math.abs(d))
    }
  }

  test("name normalization is idempotent") {
    val strs = Seq("a.b c", "..  ..", "", "x_y", "a" * 30) ++
      Seq.fill(20)(rnd.alphanumeric.take(12).mkString + ". .")
    strs.foreach { s =>
      val once = evalStr(normalizeName(col("v")), s)
      val twice = once.flatMap(o => evalStr(normalizeName(col("v")), o))
      assert(once === twice)
    }
  }

  test("pair prefix: _R1_/_R2. markers and no-marker passthrough (create_sheets.py:40)") {
    assert(evalStr(pairPrefix(col("v")), "CC131_SelS_S1_L001_R1_001.fastq.gz")
      === Some("CC131_SelS_S1_L001"))
    assert(evalStr(pairPrefix(col("v")), "samp_R2.fastq.gz") === Some("samp"))
    assert(evalStr(pairPrefix(col("v")), "nomarker.fastq.gz") === Some("nomarker.fastq.gz"))
  }

  test("id variants cover the reference's separator rewrites (update_reads.py:92-126)") {
    val out = Seq(Tuple1("CC-131_a")).toDF("v")
      .select(idVariants(col("v")).as("vs")).collect()(0)
      .getAs[scala.collection.Seq[String]]("vs")
    assert(out.contains("CC-131_a"))      // original
    assert(out.contains("CC-131-a"))      // _ -> -
    assert(out.contains("CC131_a"))       // strip -
    assert(out.contains("CC_131_a"))      // - -> _
  }

  test("fuzz_ratio: identity=100, disjoint=0, symmetry") {
    def ratio(a: String, b: String): Int =
      Seq((a, b)).toDF("a", "b")
        .select(CustomExpressions.fuzz_ratio(col("a"), col("b")).as("r"))
        .collect()(0).getInt(0)
    assert(ratio("abc", "abc") === 100)
    assert(ratio("abc", "xyz") === 0)
    assert(ratio("", "") === 100)
    // thefuzz documented example: fuzz.ratio("this is a test", "this is a test!") == 97
    assert(ratio("this is a test", "this is a test!") === 97)
    Seq.fill(20)((rnd.alphanumeric.take(rnd.nextInt(20)).mkString,
        rnd.alphanumeric.take(rnd.nextInt(20)).mkString)).foreach { case (a, b) =>
      assert(ratio(a, b) === ratio(b, a))
    }
  }

  test("yes/no gate and bool upper") {
    assert(evalStr(yesNoGate(col("v")), "YES") === Some("1"))
    assert(evalStr(yesNoGate(col("v")), "NO") === None)
    assert(evalStr(boolUpper(col("v")), "true") === Some("true"))
    assert(evalStr(boolUpper(col("v")), "FALSE") === Some("false"))
  }

  test("fillDefaults creates missing columns and fills nulls only") {
    val df = Seq(("a", null.asInstanceOf[String]), ("b", "keep")).toDF("k", "platform")
    val out = fillDefaults(df, Map("platform" -> "Illumina", "filetype" -> "fastq"))
    val rows = out.orderBy("k").collect()
    assert(rows(0).getAs[String]("platform") === "Illumina")
    assert(rows(1).getAs[String]("platform") === "keep")
    assert(rows.forall(_.getAs[String]("filetype") === "fastq"))
  }

  test("canonicalizeUrl: collisions, default ports, tracking params, case rules") {
    import spark.implicits._
    import graft.functions.CleaningFunctions.canonicalizeUrl
    val got = Seq(
      "HTTP://Example.COM:80/path/",
      "http://example.com/path",
      "https://example.com/search?utm_source=x&b=2&a=1",
      "https://example.com/search?a=1&b=2&fbclid=zzz",
      "example.com/x",
      "https://example.com:8443/keep-port/",
      "http://example.com/CaseSensitivePath",
      "http://example.com/p#a?b=1")
      .toDF("url").select(canonicalizeUrl($"url")).collect().map(_.getString(0))
    assert(got(0) === got(1))                               // port+slash+case collide
    assert(got(2) === got(3))                               // tracking params drop, rest sort
    assert(got(2) === "https://example.com/search?a=1&b=2")
    assert(got(4) === "http://example.com/x")               // scheme defaulted
    assert(got(5) === "https://example.com:8443/keep-port") // non-default port kept
    assert(got(6) === "http://example.com/CaseSensitivePath") // path case preserved
    assert(got(7) === "http://example.com/p")  // '?' inside fragment is NOT a query
  }
}
