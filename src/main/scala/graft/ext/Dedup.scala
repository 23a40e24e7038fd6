package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (SURVEY §7.9):
  * exact (content hash), MinHash+LSH near-dup, SimHash, n-gram Jaccard.
  *
  * Scale design:
  *  - exact: one hash-shuffle on the 16-byte digest, never on the text.
  *  - MinHash+LSH: signatures are narrow per-row work; the only shuffle
  *    is the band-bucket self-join (|bands|·|docs| small rows), and
  *    verification runs only on bucket-colliding candidate pairs — the
  *    all-pairs cross join never exists.
  *  - n-gram Jaccard: blocked on (lang, length-bucket) so the candidate
  *    join is bucket-local; at 100 TB the block key keeps buckets bounded.
  *
  * All hashing is md5-derived so every step is reproducible in any engine
  * (and DuckDB-oracle-checkable).
  */
object Dedup {

  /** Content hash for exact dedup. */
  def contentHash(text: Column): Column = md5(text.cast("binary"))

  /** Exact dedup: canonical = min id per content hash. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hashed = docs.select(col(idCol), contentHash(col(textCol)).as("content_hash"))
    val canon = hashed.groupBy($"content_hash".as("h"))
      .agg(min(col(idCol)).as("canonical_id"))
    hashed.join(canon, $"content_hash" === $"h")
      .select(col(idCol), $"canonical_id",
        (col(idCol) =!= $"canonical_id").as("is_dup"))
  }


  /** Word n-gram shingles (n=3): requires >= n tokens. */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array(concat_ws(" ", toks)))

  /** One MinHash signature component: min over shingles of md5(salt|s).
    * Using the lexicographic min of the salted digest = a random
    * permutation per salt, with no engine-specific hash arithmetic. */
  def minhashComponent(sh: Column, salt: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$salt|"), s).cast("binary"))))

  /** MinHash signatures + LSH bands (k components, r per band). */
  def withMinhashBands(docs: DataFrame, k: Int = 6, r: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    val sh = shingles(toks)
    val sigs = (1 to k).map(i => minhashComponent(sh, i).as(s"sig_$i"))
    val withSigs = docs.select((col(idCol) +: sigs): _*)
    val bands = (0 until k / r).map { b =>
      val parts = (1 to r).map(j => col(s"sig_${b * r + j}"))
      struct(lit(b).as("band_idx"),
        md5(concat(parts: _*).cast("binary")).as("band_val")).as(s"band_$b")
    }
    withSigs.select(col(idCol), array(bands: _*).as("bands"))
  }

  /** LSH candidate pairs: docs sharing any band bucket. */
  def lshCandidates(withBands: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val exploded = withBands
      .select(col(idCol), explode($"bands").as("b"))
      .select(col(idCol), $"b.band_idx".as("band_idx"), $"b.band_val".as("band_val"))
    val a = exploded.toDF("id_a", "band_idx", "band_val")
    val b = exploded.toDF("id_b", "band_idx", "band_val")
    a.join(b, Seq("band_idx", "band_val"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b").distinct()
  }

  /** Word-set Jaccard similarity of two token-array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash-LSH near-dup pipeline: candidates via band buckets, verified
    * with true shingle-set Jaccard >= threshold. */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cands = lshCandidates(withMinhashBands(docs, 6, 2, idCol, textCol), idCol)
    val sets = docs.select(col(idCol).as("sid"),
      array_distinct(shingles(TextStats.tokens(col(textCol)))).as("sset"))
    cands
      .join(sets.toDF("sid_a", "set_a"), $"id_a" === $"sid_a")
      .join(sets.toDF("sid_b", "set_b"), $"id_b" === $"sid_b")
      .select($"id_a", $"id_b",
        round(jaccard($"set_a", $"set_b"), 4).as("jaccard"))
      .where($"jaccard" >= threshold)
  }

  /** 16-bit SimHash from md5-derived per-token hashes: bit j of the
    * document hash is the sign of Σ_tokens (2·bit_j(h(token)) − 1). */
  def simhash16(toks: Column): Column = {
    val h = (w: Column) =>
      conv(substring(md5(w.cast("binary")), 1, 8), 16, 10).cast("long")
    val bitSums = (0 until 16).map { j =>
      aggregate(toks, lit(0L),
        (acc, w) => acc + (shiftright(h(w), j).bitwiseAND(1) * 2 - 1))
    }
    bitSums.zipWithIndex.map { case (s, j) =>
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Blocked n-gram (word-set) Jaccard near-dup: candidate pairs share
    * (lang, n_chars/100 bucket); verified Jaccard >= threshold. */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val prepared = docs.select(
      $"doc_id", $"lang", floor($"n_chars" / 100).as("len_bucket"),
      array_distinct(TextStats.tokens($"text")).as("toks"))
    val a = prepared.toDF("id_a", "lang", "len_bucket", "toks_a")
    val b = prepared.toDF("id_b", "lang", "len_bucket", "toks_b")
    a.join(b, Seq("lang", "len_bucket"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"lang",
        round(jaccard($"toks_a", $"toks_b"), 4).as("jaccard"))
      .where($"jaccard" >= threshold)
  }
}
