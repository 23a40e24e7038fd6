package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, QueryGroup}
import graft.io.Sources

/** S2/S4 — file-reader operators checked against DuckDB reading the SAME
  * fixture file from disk: the Spark side runs the header-probing reader
  * (junk preamble lines), the oracle uses read_csv with an explicit skip. */
object SourceQueries extends QueryGroup {

  private val fixturePath =
    "/root/repo/src/test/resources/fixtures/samples_non_minicore.tsv"

  def headerProbeTsv(spark: SparkSession, dir: String): DataFrame =
    Sources.readTsvHeaderProbe(spark, fixturePath)
      .select($"`*sample_name`", $"`*organism`", $"`*collection_date`",
        $"`*geo_loc_name`", $"`*tissue`")
      .orderBy($"`*sample_name`")

  private val headerProbeTsvSql =
    s"""SELECT "*sample_name", "*organism", "*collection_date",
       |       "*geo_loc_name", "*tissue"
       |FROM read_csv('$fixturePath', delim='\t', skip=2, header=true,
       |              all_varchar=true)
       |ORDER BY "*sample_name"""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("s2_header_probe_tsv", headerProbeTsv, Some(headerProbeTsvSql)))
}
