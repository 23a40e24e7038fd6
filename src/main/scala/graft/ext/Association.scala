package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — co-occurrence pairs with EXACT
  * integer support / confidence / lift. The affinity analysis a
  * curation pipeline runs over (document, tag) or (order, item) pairs:
  * which labels pull each other in, which sources co-occur in the same
  * cluster, which items predict another.
  *
  * All ratio metrics are quantized basis points computed by integer
  * cross-multiplication of exact counts (confidence = ⌊10⁴·c_ab∕c_a⌋,
  * lift = ⌊10⁴·c_ab·N∕(c_a·c_b)⌋) — a float ratio of two counts sums
  * in engine order and cannot sit behind a cross-engine hash gate.
  *
  * Scale shape: ONE shuffle builds the per-basket sorted item set;
  * singles and pairs are narrow explodes of that persisted frame (the
  * pair explode is bounded by the per-basket item count, so a basket
  * with b distinct items emits b(b−1)∕2 rows — cap upstream if baskets
  * are unbounded); the item-cardinality count frames broadcast back.
  * Nothing ever joins the raw item stream to itself.
  */
object Association {

  /** Association rules over `(basketCol, itemCol)` rows (duplicates
    * within a basket count once). Returns one row per unordered item
    * pair `(a < b)` with support `c_ab`, the single supports, both
    * direction confidences, and lift — every metric an exact integer.
    *
    * `minPairSupport` prunes pairs BEFORE the metric joins (the
    * standard min-support cut; at scale this is what keeps the pair
    * table proportional to the signal, not the noise). */
  def assocRules(items: DataFrame, basketCol: String, itemCol: String,
      minPairSupport: Long = 2L): DataFrame = {
    require(minPairSupport >= 1, s"minPairSupport must be >= 1")
    val baskets = items
      .select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .groupBy($"_b")
      .agg(array_sort(collect_set($"_i")).as("_items"))
      .persistScoped // read three times: total, singles, pairs
    val total = baskets.agg(count(lit(1)).as("n_baskets"))
    val singles = baskets
      .select(explode($"_items").as("_item"))
      .groupBy($"_item").agg(count(lit(1)).as("_c"))
    // all (a < b) pairs of the sorted set, emitted narrowly in-row
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(_items, (x, i) ->
          |  transform(slice(_items, i + 2, size(_items)),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("_p"))
      .select($"_p.a".as("a"), $"_p.b".as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("c_ab"))
      .where($"c_ab" >= minPairSupport)
    pairs
      .join(broadcast(singles.select($"_item".as("a"), $"_c".as("c_a"))), Seq("a"))
      .join(broadcast(singles.select($"_item".as("b"), $"_c".as("c_b"))), Seq("b"))
      .crossJoin(broadcast(total))
      .select($"a", $"b", $"c_ab", $"c_a", $"c_b",
        expr("(10000 * c_ab) div c_a").as("conf_ab_bp"),
        expr("(10000 * c_ab) div c_b").as("conf_ba_bp"),
        expr("(10000 * c_ab * n_baskets) div (c_a * c_b)").as("lift_bp"))
  }
}
