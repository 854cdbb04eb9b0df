package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Multimodal.asAssetTable(
    Seq((1L, "tiny payload"), (2L, "a much longer payload for frames"))
      .toDF("id", "data"),
    "id", "data", "image")

  test("asset table schema: binary payload + typed metadata struct") {
    val f = assets.schema("payload")
    assert(f.dataType.typeName === "binary")
    val meta = assets.select("meta.modality", "meta.n_bytes", "meta.format")
      .as[(String, Int, String)].collect().toList
    assert(meta === List(("image", 12, "raw"), ("image", 32, "raw")))
  }

  test("feature extraction: deterministic stub, stable across partitionings") {
    val one = Multimodal.extractFeatures(assets.coalesce(1), dim = 4)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    val four = Multimodal.extractFeatures(assets.repartition(4), dim = 4)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(one === four)
    assert(one(1L).length === 4)
    assert(one(1L) !== one(2L))
  }

  test("features feed the kNN surface (array<float> handoff)") {
    val feats = Multimodal.extractFeatures(assets, dim = 4)
      .toDF().select(col("asset_id").as("id"),
        col("features").as("vector"), lit(false).as("deleted"))
    val q = feats.select(col("id").as("query_id"),
      col("vector").as("query_vec")).limit(1)
    val hits = graft.operators.KnnSearch.knnExact(feats, q, k = 1, minSim = -2.0)
    assert(hits.count() === 1) // self-match survives the full search path
  }

  test("frame sampling: every stride-th fixed-size frame") {
    val frames = Multimodal.sampleFrames(
      assets.filter(col("asset_id") === 2L), frameBytes = 8, stride = 2)
      .as[(Long, Long, Array[Byte])].collect().toList
    // 32 bytes → 4 frames of 8; stride 2 keeps frames 0 and 2
    assert(frames.map(_._2) === List(0L, 2L))
    assert(frames.forall(_._3.length === 8))
    assert(new String(frames.head._3) === "a much l")
  }
}
