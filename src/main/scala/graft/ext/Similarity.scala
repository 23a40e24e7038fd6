package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (SURVEY §7.9).
  *
  * Baseline: brute-force cosine top-k (exact; the right answer at small
  * query-set sizes — the corpus scan is embarrassingly parallel and
  * never shuffles the corpus).
  * Scale path: random-hyperplane LSH bucketing — candidates only form
  * within a bucket, so the all-pairs product never materializes; recall
  * is tested against the brute-force baseline (SimilaritySpec).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double in
    * index order (deterministic, engine-portable). Backed by the codegen
    * [[graft.functions.DotProduct]] expression — the equivalent
    * zip_with/aggregate formulation runs interpreted (no codegen for
    * higher-order functions) and was the bench hotspot for cosine
    * scoring. Results are bit-identical. */
  def dot(a: Column, b: Column): Column =
    graft.functions.CustomExpressions.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))


  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself). Query side should be small —
    * it is broadcast, so the big corpus never shuffles. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.join(broadcast(q), $"q_id" =!= $"n_id")
      .select($"q_id", $"n_id", cosine($"q_vec", $"n_vec").as("cos"))
    val w = Window.partitionBy($"q_id").orderBy(desc("cos"), $"n_id")
    scored.withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"q_id", $"n_id", $"rank", floorQ4($"cos").as("cos_q4"))
  }

  /** Mode-free 4-decimal quantization: floor(x·10⁴) is bit-deterministic
    * across engines given identical doubles, unlike round() whose
    * half-way behavior differs (Spark exact-decimal HALF_UP vs DuckDB
    * scaled nearbyint) — a real divergence observed at sf0.1. */
  def floorQ4(c: Column): Column = floor(c * 10000).cast("long")

  /** Deterministic pseudo-random hyperplanes (seeded), dim × nPlanes. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id from `nPlanes` hyperplane projections. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = dot(vec, array(p.map(lit): _*))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: probes only its own bucket (single-probe). With
    * b sign bits the corpus splits into ≤2^b buckets; the join is
    * bucket-equi (shuffle on bucket id), never all-pairs. Recall vs
    * brute force is traded via b — tested in SimilaritySpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 8,
      dim: Int = 64, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, nPlanes)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where($"q_id" =!= $"n_id")
      .select($"q_id", $"n_id", cosine($"q_vec", $"n_vec").as("cos"))
    val w = Window.partitionBy($"q_id").orderBy(desc("cos"), $"n_id")
    scored.withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"q_id", $"n_id", $"rank", floorQ4($"cos").as("cos_q4"))
  }

  /** Embedding-cosine near-dup pairs (blocked by label to bound the
    * candidate set; at scale the block key would be an LSH bucket). */
  def cosineNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = embeddings.select($"vec_id", $"label", $"embedding")
    val a = e.toDF("id_a", "label", "vec_a")
    val b = e.toDF("id_b", "label", "vec_b")
    a.join(b, Seq("label"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"label",
        floorQ4(cosine($"vec_a", $"vec_b")).as("cos_q4"))
      .where($"cos_q4" >= math.floor(threshold * 10000).toLong)
  }
}
