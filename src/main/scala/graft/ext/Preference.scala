package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Pairwise-preference strength estimation — the Bradley–Terry model
  * (Bradley & Terry 1952), fit with Hunter's MM iteration ("MM
  * algorithms for generalized Bradley–Terry models", Annals of
  * Statistics 2004, eq. 2): given outcomes "i beat j", estimate a
  * positive strength p_i per player such that
  * P(i beats j) = p_i ∕ (p_i + p_j). This is the standard readout for
  * preference / annotation data in a training pipeline — which model,
  * prompt variant, or data source wins pairwise comparisons once the
  * comparison graph is chance-corrected — where a raw win RATE is
  * confounded by who each player happened to face.
  *
  * The MM update is p_i ← W_i ∕ Σ_j n_ij ∕ (p_i + p_j) (W_i = total
  * wins of i, n_ij = games between i and j), run a FIXED `iters`
  * rounds from p = 1 and normalized once at the end to Σ p = 1 —
  * fixed-iteration means the output is well-defined even when the
  * comparison graph is not strongly connected (Zermelo's convergence
  * precondition), and the oracle can replay the arithmetic exactly.
  *
  * Scale shape: the heavy side — reducing raw outcomes (billions of
  * comparisons at 100 TB) to the per-ordered-pair win matrix — is one
  * map-side-combinable `groupBy(winner, loser).count`, cardinality ≤
  * players². The fit itself runs on the driver over that bounded
  * matrix (the k-means-centroid pattern: iterate small state, never
  * row data), behind a LOUD `maxPlayers` count gate — a player
  * cardinality in the millions wants a different estimator, not a
  * silent 10¹²-cell collect. Zero-strength poles cannot NaN: at
  * iteration 1 every p = 1, and two players with a game between them
  * can never BOTH have zero wins (their mutual game has a winner), so
  * p_i + p_j > 0 whenever n_ij > 0.
  */
object Preference {

  /** Fit strengths from a frame of decided outcomes. Returns one row
    * per player that played ≥ 1 game:
    * `(player, wins, games, strength, rnk)` — strength rounded to 6 dp
    * (sum-normalized), rank ordered by (rounded strength DESC, player)
    * so the readout is engine-stable. */
  def bradleyTerry(outcomes: DataFrame, winnerCol: String = "winner",
      loserCol: String = "loser", iters: Int = 10,
      maxPlayers: Int = 1024): DataFrame =
    bradleyTerryFromMatrix(
      outcomes.groupBy(col(winnerCol).as("i"), col(loserCol).as("j"))
        .agg(count(lit(1)).as("w")),
      iters = iters, maxPlayers = maxPlayers)

  /** The fit half of [[bradleyTerry]], over an ALREADY-REDUCED directed
    * win matrix `(winner, loser, wins)` — the entry point for
    * incrementally-maintained matrices (the streaming preference sink
    * keeps one as a running-aggregate table; a warehouse job may keep
    * one per day and fit on demand). Re-aggregates per ordered pair on
    * the way in, so unioned partial matrices are fine. */
  def bradleyTerryFromMatrix(matrix: DataFrame, winnerCol: String = "i",
      loserCol: String = "j", winsCol: String = "w", iters: Int = 10,
      maxPlayers: Int = 1024): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = matrix.sparkSession

    val dw = matrix
      .groupBy(col(winnerCol).cast("string").as("i"),
        col(loserCol).cast("string").as("j"))
      .agg(sum(col(winsCol).cast("long")).as("w"))
      .where($"i".isNotNull && $"j".isNotNull && $"i" =!= $"j" && $"w" > 0L)
      .persistScoped
    val nPlayers = dw.select($"i").unionByName(dw.select($"j".as("i")))
      .distinct().count()
    require(nPlayers <= maxPlayers,
      s"bradleyTerry: $nPlayers players exceeds maxPlayers=$maxPlayers " +
        "(the driver-side MM fit is players^2-bounded by design)")

    val cells = dw.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val players = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    val idx = players.zipWithIndex.toMap
    val k = players.length
    val wins = new Array[Long](k)
    val n = Array.ofDim[Long](k, k) // symmetric games matrix
    cells.foreach { case (a, b, w) =>
      val (ia, ib) = (idx(a), idx(b))
      wins(ia) += w
      n(ia)(ib) += w
      n(ib)(ia) += w
    }
    var p = Array.fill(k)(1.0)
    for (_ <- 1 to iters) {
      val next = new Array[Double](k)
      var i = 0
      while (i < k) {
        var s = 0.0
        var j = 0
        while (j < k) { // ascending-j sum order is part of the contract
          if (n(i)(j) > 0) s += n(i)(j).toDouble / (p(i) + p(j))
          j += 1
        }
        next(i) = if (s > 0) wins(i).toDouble / s else 0.0
        i += 1
      }
      p = next
    }
    val tot = p.sum
    val strength = p.map(v => if (tot > 0) v / tot else 0.0)
      .map(v => math.rint(v * 1e6) / 1e6) // round HALF_EVEN, 6 dp
    val games = (0 until k).map(i => (0 until k).map(n(i)).sum)
    val ranked = players.indices
      .sortBy(i => (-strength(i), players(i)))
      .zipWithIndex.map { case (i, r) => i -> (r + 1L) }.toMap
    val rows = players.indices.map { i =>
      Row(players(i), wins(i), games(i), strength(i), ranked(i))
    }
    val schema = StructType(Seq(
      StructField("player", StringType, nullable = false),
      StructField("wins", LongType, nullable = false),
      StructField("games", LongType, nullable = false),
      StructField("strength", DoubleType, nullable = false),
      StructField("rnk", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Condorcet-cycle audit — the TRANSITIVITY check a preference
    * dataset (or the [[bradleyTerry]] model about to be fit on it)
    * deserves: player a DOMINATES b when a won their head-to-head
    * majority (w_ab > w_ba, strict; ties and splits are incomparable),
    * and a triple a→b→c→a is a Condorcet cycle — preference data a
    * single strength axis cannot represent. Reports, as one row:
    * players, strict dominances, comparable triples (all three pairs
    * decided), cycles, and the cycle share in basis points.
    *
    * Every cyclic triangle has exactly one rotation starting at its
    * lexicographically-least node, so `a < b AND a < c` counts each
    * cycle once; comparable triples are counted on the UNDIRECTED
    * majority graph with `a < b < c`. Scale shape: reducing raw
    * outcomes is the same map-side `groupBy(winner, loser)` as the BT
    * fit; the triangle joins then run on the players²-bounded
    * dominance matrix — this is an audit over a panel∕model roster,
    * and the cubic triple enumeration is in ROSTER size only, never
    * in outcome volume. Fully distributed: no collect anywhere. */
  def condorcetCycles(outcomes: DataFrame, winnerCol: String = "winner",
      loserCol: String = "loser"): DataFrame = {
    val dw = outcomes
      .groupBy(col(winnerCol).cast("string").as("i"),
        col(loserCol).cast("string").as("j"))
      .agg(count(lit(1)).as("w"))
      .where($"i".isNotNull && $"j".isNotNull && $"i" =!= $"j")
      .persistScoped
    val dom = dw
      .join(dw.select($"j".as("i"), $"i".as("j"), $"w".as("wr")),
        Seq("i", "j"), "left_outer")
      .where($"w" > coalesce($"wr", lit(0L)))
      .select($"i".as("a"), $"j".as("b"))
      .persistScoped // three legs of the triangle join + the edge count
    val nPlayers = dw.select($"i").unionByName(dw.select($"j".as("i")))
      .distinct().agg(count(lit(1)).as("n_players"))
    val nDom = dom.agg(count(lit(1)).as("n_dominances"))
    val cycles = dom
      .join(dom.select($"a".as("b"), $"b".as("c")), Seq("b"))
      .join(dom.select($"a".as("c"), $"b".as("x")), Seq("c"))
      .where($"x" === $"a" && $"a" < $"b" && $"a" < $"c")
      .agg(count(lit(1)).as("n_cycles"))
    val und = dom.select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
    val comparable = und
      .join(und.select($"a".as("b"), $"b".as("c")), Seq("b"))
      .join(und.select($"a", $"b".as("c")), Seq("a", "c"), "left_semi")
      .where($"a" < $"b" && $"b" < $"c")
      .agg(count(lit(1)).as("n_comparable_triples"))
    nPlayers.crossJoin(broadcast(nDom)).crossJoin(broadcast(comparable))
      .crossJoin(broadcast(cycles))
      .select($"n_players", $"n_dominances", $"n_comparable_triples",
        $"n_cycles",
        expr("""CASE WHEN n_comparable_triples = 0 THEN CAST(0 AS BIGINT)
                ELSE (10000 * n_cycles) div n_comparable_triples
                END""").as("cycle_bp"))
  }
}
