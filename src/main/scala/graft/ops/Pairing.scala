package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{CleaningFunctions, CustomExpressions}

/** R1/R2 read pairing — J5 (fuzzy, create_sheets.py:20-64) and J6
  * (positional, create_sheets_ultimate.py:388-423).
  *
  * Both are narrow after one grouping shuffle: arrays are sorted
  * per-sample, exploded, re-grouped by a derived pair key. No UDFs;
  * the fuzzy scorer is the codegen'd FuzzWRatio expression — the same
  * weighted combination thefuzz's process.extract applies.
  */
object Pairing {

  /** J6 — positional pairing: sorted `files`, consecutive pairs, only
    * even-length lists (the reference silently skips odd ones). Output:
    * one row per pair with filename/filename2/library_ID/title.
    *
    * Reassembly is keyed on a pre-explode `monotonically_increasing_id`,
    * NOT on the full input row: the shuffle key is the narrow
    * (_row_id, pair_id) pair, the payload columns ride along as
    * `first(...)` aggregates (the two rows of a pair are adjacent after
    * posexplode, so map-side partial aggregation collapses them before
    * the exchange — the wide row crosses the wire once per pair, never
    * as a grouping key). This also makes the operator safe for
    * non-groupable payload columns (e.g. the `extra: Map` contract) and
    * matches the reference's per-row iteration: duplicate input rows
    * each produce their own pairs (create_sheets_ultimate.py:394-419
    * iterrows — a row-wise loop, not a distinct-on-all-columns). */
  def pairPositional(samples: DataFrame,
      filesCol: String = "files", organismCol: String = "organism"): DataFrame = {
    val payload = samples.columns.filterNot(_ == filesCol)
    val tagged = samples
      .where(col(filesCol).isNotNull && size(col(filesCol)) > 0 &&
        pmod(size(col(filesCol)), lit(2)) === 0)
      .withColumn("_row_id", monotonically_increasing_id())
    val aggs = payload.toSeq.map(c => first(col(c)).as(c)) ++ Seq(
      min(struct(col("pos"), col("one_file"))).as("f1"),
      max(struct(col("pos"), col("one_file"))).as("f2"))
    tagged
      .select((col("_row_id") +: payload.map(col)) :+
        posexplode(sort_array(col(filesCol))).as(Seq("pos", "one_file")): _*)
      .withColumn("pair_id", floor(col("pos") / 2))
      .groupBy(col("_row_id"), col("pair_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        (payload.map(col) ++ Seq(
          col("pair_id"),
          col("f1.one_file").as("filename"),
          col("f2.one_file").as("filename2"),
          CleaningFunctions.libraryId(col("f1.one_file")).as("library_ID"),
          CleaningFunctions.wgsTitle(col(organismCol)).as("title"))): _*)
  }

  /** J5 — fuzzy pairing: per sample, prefixes = distinct
    * `re.split("_R\\d[._]")[0]` over the sorted files; per prefix the
    * top-2 files by fuzz.WRatio(prefix, file) form a pair (best first,
    * order-dependent ties resolved to the prefix's own files — matching
    * thefuzz process.extract wherever its answer is order-independent).
    * 2-file samples pair directly; 3-file / odd shapes drop (reference
    * behavior). */
  def pairFuzzy(samples: DataFrame, sampleCol: String = "sample_name",
      filesCol: String = "files", organismCol: String = "organism"): DataFrame = {
    val base = samples
      .where(col(filesCol).isNotNull)
      .select(col(sampleCol), col(organismCol),
        sort_array(col(filesCol)).as("sfiles"))

    // exactly-2 case: direct pair in sorted order
    val direct = base.where(size(col("sfiles")) === 2)
      .select(col(sampleCol), col(organismCol),
        element_at(col("sfiles"), 1).as("filename"),
        element_at(col("sfiles"), 2).as("filename2"))

    // >=4 case: prefix set × files, fuzzy top-2 per prefix
    val big = base.where(size(col("sfiles")) >= 4)
    val prefixes = big
      .select(col(sampleCol), explode(col("sfiles")).as("f"))
      .select(col(sampleCol), CleaningFunctions.pairPrefix(col("f")).as("prefix"))
      .distinct()
    val scored = prefixes
      .join(big.select(col(sampleCol), col(organismCol),
        explode(col("sfiles")).as("file")), Seq(sampleCol))
      // the REAL scorer thefuzz's process.extract uses (codegen'd
      // FuzzWRatio kernel), so unambiguous rankings match thefuzz by
      // construction, not by heuristic
      .withColumn("score",
        CustomExpressions.fuzz_wratio(col("prefix"), col("file")))
      // WRatio ties are order-dependent in thefuzz (the reference's own
      // pathological case, create_sheets.py:43-46: a probe that is a
      // substring of EVERY file scores partial=100→90 across lanes);
      // exact-own-prefix breaks those ties to the pair the reference
      // intends, deterministically — it ranks BELOW the score, so it
      // only ever decides between score-equal candidates
      .withColumn("exact",
        (CleaningFunctions.pairPrefix(col("file")) === col("prefix")).cast("int"))
    val w = Window.partitionBy(col(sampleCol), col("prefix"))
      .orderBy(desc("score"), desc("exact"), col("file"))
    val fuzzyPairs = scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .groupBy(col(sampleCol), col("prefix"), col(organismCol))
      .agg(
        min(struct(col("rn"), col("file"))).as("m1"),
        max(struct(col("rn"), col("file"))).as("m2"))
      .where(col("m1.rn") === 1 && col("m2.rn") === 2)  // need a full pair
      .select(col(sampleCol), col(organismCol),
        col("m1.file").as("filename"), col("m2.file").as("filename2"))

    direct.unionByName(fuzzyPairs)
      .withColumn("library_ID", CleaningFunctions.libraryId(col("filename")))
      .withColumn("title", CleaningFunctions.wgsTitle(col(organismCol)))
  }
}
