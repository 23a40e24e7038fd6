package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup == window row_number on randomized data with ties") {
    val rnd = new scala.util.Random(19)
    // heavy ties (values from a tiny set) across skewed group sizes
    val rows = (1 to 4000).map { i =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(5).toDouble, i.toLong)
    }
    val df = rows.toDF("grp", "v", "id").repartition(13)
    val got = TopK.topKPerGroup(df, Seq("grp"), "v", "id", k = 4)
      .select($"grp", $"rnk", $"id", $"v")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val w = Window.partitionBy($"grp").orderBy($"v".desc, $"id")
    val want = df.withColumn("rnk", row_number().over(w)).where($"rnk" <= 4)
      .select($"grp", $"rnk", $"id", $"v")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("groups smaller than k emit all members; k=1 is argmax") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 5.0, 3L))
      .toDF("grp", "v", "id")
    assert(TopK.topKPerGroup(df, Seq("grp"), "v", "id", 5).count() === 3)
    val arg = TopK.topKPerGroup(df, Seq("grp"), "v", "id", 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(arg === Map("a" -> 2L, "b" -> 3L))
  }

  test("plan: partial+final object aggregate pair (map-side prune), no window sort") {
    val df = Tables.load(spark, sfDir, "events")
    val plan = TopK.topKPerGroup(df, Seq("event_type"), "value", "event_id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.split("ObjectHashAggregate").length - 1 >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }
}
