package graft

/** Canary over the driver-owned testdata: loads every table in
  * [[Tables.all]] from sf0.001 and pins the post-[[Tables.load]] schema
  * every query in the repo relies on.
  *
  * The driver regenerated `/root/testdata` once mid-build (events.ts
  * changed TIMESTAMP(NANOS) -> timestamp[us]) and ten queries silently
  * vanished from the correctness gate. This spec turns the next silent
  * regeneration into a named failure with a readable diff.
  *
  * Note these are the NORMALIZED schemas (after Tables.load), not the
  * raw parquet footers — events.ts must come out as a session-zoned
  * timestamp whether the file encodes nanos-int64, timestamp[us], or
  * NTZ, because that is the contract the window/asof/range operators
  * are written against.
  */
class TestdataCanarySpec extends SparkSpec {
  private val canaryDir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey:int", "r_name:string"),
    "nation" -> Seq("n_nationkey:int", "n_name:string", "n_regionkey:int"),
    "customer" -> Seq("c_custkey:bigint", "c_name:string", "c_nationkey:int",
      "c_acctbal:double", "c_mktsegment:string"),
    "supplier" -> Seq("s_suppkey:bigint", "s_name:string", "s_nationkey:int",
      "s_acctbal:double"),
    "part" -> Seq("p_partkey:bigint", "p_name:string", "p_brand:string",
      "p_type:string", "p_size:int", "p_retailprice:double"),
    "orders" -> Seq("o_orderkey:bigint", "o_custkey:bigint",
      "o_orderstatus:string", "o_totalprice:double",
      "o_orderdate:timestamp_ntz", "o_orderpriority:string"),
    "lineitem" -> Seq("l_orderkey:bigint", "l_partkey:bigint",
      "l_suppkey:bigint", "l_linenumber:int", "l_quantity:double",
      "l_extendedprice:double", "l_discount:double", "l_tax:double",
      "l_returnflag:string", "l_linestatus:string",
      "l_shipdate:timestamp_ntz"),
    // ts is the normalized type: session-zoned timestamp, whatever the file had
    "events" -> Seq("event_id:bigint", "ts:timestamp", "user_id:bigint",
      "event_type:string", "value:double", "props:string"),
    "documents" -> Seq("doc_id:bigint", "text:string", "lang:string",
      "source:string", "n_chars:bigint"),
    "embeddings" -> Seq("vec_id:bigint", "embedding:array<float>",
      "label:int"))

  test("every table loads with the schema the queries are written against") {
    val diffs = Tables.all.flatMap { t =>
      val got = Tables.load(spark, canaryDir, t).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").toSeq
      if (got == expected(t)) None
      else Some(s"$t:\n  expected ${expected(t).mkString(", ")}\n  got      ${got.mkString(", ")}")
    }
    assert(diffs.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT (driver regenerated /root/testdata?):\n${diffs.mkString("\n")}")
  }

  test("every table at sf0.001 is non-empty") {
    Tables.all.foreach { t =>
      assert(Tables.load(spark, canaryDir, t).limit(1).count() == 1L, s"$t is empty")
    }
  }
}
