package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val assets = Multimodal.syntheticAssets(
    spark, Tables.load(spark, sfDir, "documents")).cache()

  test("decode: one meta row per asset, deterministic, kind-appropriate fields") {
    val meta = Multimodal.decode(assets).cache()
    assert(meta.count() === assets.count())
    val again = Multimodal.decode(assets)
    assert(meta.toDF().exceptAll(again.toDF()).isEmpty)
    meta.collect().foreach { m =>
      m.kind match {
        case "image" => assert(m.width > 0 && m.height > 0 && m.n_frames === 1)
        case "audio" => assert(m.sample_rate_hz > 0 && m.width === 0)
        case "video" => assert(m.n_frames > 0 && m.width > 0)
      }
      assert(m.n_bytes > 0)
    }
    meta.unpersist()
  }

  test("feature extraction: fixed 8-dim, L1-normalized") {
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features.length === 8)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("frame sampling: every stride-th frame, videos only") {
    val meta = Multimodal.decode(assets)
    val frames = Multimodal.sampleFrames(meta, stride = 10)
    val byAsset = frames.groupBy("asset_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("maxi"))
    val joined = byAsset.join(meta.toDF(), Seq("asset_id"))
    joined.collect().foreach { r =>
      val nFrames = r.getAs[Int]("n_frames")
      val expected = (nFrames + 9) / 10  // ceil(n_frames / stride)
      assert(r.getAs[Long]("n") === expected)
      assert(r.getAs[Int]("maxi") < nFrames)
      assert(r.getAs[String]("kind") === "video")
    }
  }

  test("plan is narrow: decode stage has no shuffle") {
    val plan = Multimodal.decode(assets).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in decode plan:\n$plan")
  }
}
