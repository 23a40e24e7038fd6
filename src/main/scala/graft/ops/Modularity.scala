package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.ColInterpolator

/** Newman modularity of a labeled partition over an undirected edge
  * list — the "are these communities real" score for any clustering of
  * a graph (label propagation output, connected components, or a free
  * partition like source/domain). The per-community contribution is
  *
  *   Q_c = e_c∕m − (d_c∕2m)²
  *
  * (e_c = edges inside c, d_c = degree mass of c, m = total edges),
  * emitted in exact basis points as
  * `q_bp = (10⁴·(4·m·e_c − d_c²)) div (4·m²)` — the numerator is signed,
  * division is toward-zero truncating in BOTH engines (Spark `div` ≡
  * DuckDB `//`), and the 10⁴-scaled product runs in decimal(38,0) so the
  * arithmetic never overflows at any edge count (4·m² alone saturates a
  * long near m = 1.5·10⁹ edges). Total modularity = Σ q_bp ∕ 10⁴ up to
  * per-community floor rounding.
  *
  * Scale shape: one degree aggregate over the edge endpoints, one
  * edges⋈labels equi-join per endpoint (label frame is node-sized, the
  * join is the only corpus-scale shuffle), one label rollup; the edge
  * count broadcasts as a one-row frame. Communities with no incident
  * edges carry no degree/edge mass and are reported with e_c = d_c = 0
  * via the right join on the label universe.
  */
object Modularity {

  /** Per-community modularity contributions.
    *
    * @param edges  undirected edge list, one row per edge (id_a, id_b)
    * @param labels node → community assignment; nodes missing from
    *               `labels` are excluded from the score (their edges
    *               still count toward m and their neighbors' degrees)
    */
  def modularity(edges: DataFrame, labels: DataFrame,
      idColA: String = "id_a", idColB: String = "id_b",
      idCol: String = "id", labelCol: String = "label"): DataFrame = {
    val e = edges.select(col(idColA).as("a"), col(idColB).as("b"))
    val lab = labels.select(col(idCol).as("id"), col(labelCol).as("label"))
    val mTot = e.agg(count(lit(1)).as("m"))
    val deg = e.select($"a".as("id")).unionAll(e.select($"b".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("d"))
    val dLab = deg.join(lab, Seq("id"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_nodes"), sum($"d").as("d_tot"))
    val eIn = e
      .join(lab.toDF("a", "_la"), Seq("a"))
      .join(lab.toDF("b", "_lb"), Seq("b"))
      .where($"_la" === $"_lb")
      .groupBy($"_la".as("label")).agg(count(lit(1)).as("e_in"))
    lab.select($"label").distinct()
      .join(dLab, Seq("label"), "left")
      .join(eIn, Seq("label"), "left")
      .crossJoin(broadcast(mTot))
      .select($"label",
        coalesce($"n_nodes", lit(0L)).as("n_nodes"),
        coalesce($"e_in", lit(0L)).as("e_in"),
        coalesce($"d_tot", lit(0L)).as("d_tot"),
        expr("""(cast(10000 as decimal(38,0)) *
                 (cast(4 as decimal(38,0)) * cast(m as decimal(38,0)) *
                    cast(coalesce(e_in, 0) as decimal(38,0)) -
                  cast(coalesce(d_tot, 0) as decimal(38,0)) *
                    cast(coalesce(d_tot, 0) as decimal(38,0))))
                div (cast(4 as decimal(38,0)) *
                     cast(m as decimal(38,0)) * cast(m as decimal(38,0)))
             """).as("q_bp"))
  }

  /** CONDUCTANCE per community — the cut-quality score next to
    * modularity's null-model score (Kannan, Vempala & Vetta 2004; the
    * community-goodness measure clustering surveys standardize on):
    * φ(c) = cut(c) ∕ min(vol(c), 2m − vol(c)), where cut counts edges
    * with exactly one endpoint in c and vol is the community's degree
    * mass. Modularity says "denser than chance"; conductance says "how
    * leaky is the boundary" — a community can score well on one and
    * badly on the other, which is why audits report both. Exact basis
    * points, truncating div, communities without incident edges
    * dropped (no boundary to measure); a community holding every edge
    * reports 0 (its complement has no volume).
    *
    * Scale shape: one endpoint-degree aggregate, two node-sized label
    * joins onto the pair list, label-grain rollups; 2m broadcasts as a
    * one-row frame. */
  def conductance(pairs: DataFrame, labels: DataFrame): DataFrame = {
    val adj = pairs.select($"id_a".as("id"))
      .unionByName(pairs.select($"id_b".as("id")))
    val deg = adj.groupBy($"id").agg(count(lit(1)).as("deg"))
    val vol = labels.join(deg, Seq("id"), "left_outer")
      .groupBy($"lab")
      .agg(count(lit(1)).as("n_members"),
        sum(coalesce($"deg", lit(0L))).as("vol"))
    val tot = deg.agg(sum($"deg").as("twoe"))
    val la = labels.select($"id".as("id_a"), $"lab".as("la"))
    val lb = labels.select($"id".as("id_b"), $"lab".as("lb"))
    val cut = pairs.join(la, Seq("id_a")).join(lb, Seq("id_b"))
      .where($"la" =!= $"lb")
      .select(explode(array($"la", $"lb")).as("lab"))
      .groupBy($"lab").agg(count(lit(1)).as("cut"))
    vol.join(cut, Seq("lab"), "left_outer")
      .crossJoin(broadcast(tot))
      .withColumn("cut", coalesce($"cut", lit(0L)))
      .where($"vol" > 0)
      .select($"lab".as("community"), $"n_members", $"vol", $"cut",
        when(least($"vol", $"twoe" - $"vol") === 0, 0L)
          .otherwise(expr("(10000 * cut) div least(vol, twoe - vol)"))
          .as("conductance_bp"))
  }
}
