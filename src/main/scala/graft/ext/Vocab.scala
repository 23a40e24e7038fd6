package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary-based tokenization: build a piece vocabulary from the
  * corpus, then encode every document to token ids — the "apply the
  * tokenizer at scale" step between BPE training ([[TextStats.vocabPairs]]
  * is one training statistic) and sequence packing
  * ([[Sampling.packSequences]] consumes the resulting counts).
  *
  * Scale shape: the vocabulary is bounded by construction (`size`
  * entries — a tokenizer vocab is 32–256k in practice), so it is a
  * legitimate bounded driver materialization, exactly like IVF
  * centroids. The encode pass then rides the collected vocab into a
  * MAP LITERAL inside a narrow expression — zero joins, zero
  * shuffles, one codegen'd scan pass per document. Encoding 100 TB is
  * a map-only job; only the vocab build aggregates (one map-side
  * combined count + a TakeOrdered top-k).
  */
object Vocab {

  /** Top-`size` pieces by (count DESC, piece ASC — deterministic cut),
    * ids assigned by rank starting at 1 (0 is reserved for OOV).
    * Plans as TakeOrderedAndProject over a partial-aggregated count:
    * no full sort, no full vocabulary shuffle to one node. */
  def buildVocab(docs: DataFrame, size: Int,
      textCol: String = "text"): Map[String, Int] = {
    require(size >= 1, s"size must be >= 1, got $size")
    docs
      .select(explode(TextStats.pieces(col(textCol))).as("piece"))
      .groupBy($"piece").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"piece".asc)
      .limit(size)
      .select($"piece")
      .collect()
      .iterator
      .zipWithIndex
      .map { case (r, i) => r.getString(0) -> (i + 1) }
      .toMap
  }

  /** Encode each document against `vocab`: ordered token ids (OOV → 0).
    * Returns doc_id, `n_pieces`, `n_oov`, and `ids_csv` — the first
    * `headIds` ids as a csv string (the bounded preview shape the
    * driver's comparator can hash; the full id array stays available
    * via the `_ids` intermediate for library callers who re-select it).
    * Entirely narrow: the vocab map is a literal riding the task
    * binary, so the plan is scan → project, no exchange. */
  def encode(docs: DataFrame, vocab: Map[String, Int], headIds: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(headIds >= 1, s"headIds must be >= 1, got $headIds")
    require(vocab.nonEmpty, "vocab must not be empty")
    val m = typedLit(vocab)
    docs
      .withColumn("_ids",
        transform(TextStats.pieces(col(textCol)),
          p => coalesce(element_at(m, p), lit(0))))
      .select(
        col(idCol),
        size($"_ids").cast("long").as("n_pieces"),
        size(filter($"_ids", i => i === 0)).cast("long").as("n_oov"),
        array_join(slice($"_ids", 1, headIds), ",").as("ids_csv"))
  }
}
