package graft

import java.nio.file.Files

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._

import graft.operators.{FeaturePipelines, Multimodal}

class FeatureSpec extends SparkSpec {
  import spark.implicits._

  test("F1 char-bigram TF: banana bigram weights 1/3, 2/3, 2/3") {
    val df = Seq((0L, "banana")).toDF("id", "mention")
    val model = FeaturePipelines.charBigramTf("mention", "features").fit(df)
    val rel = FeaturePipelines.charBigramRelation(model, df, "id")
      .orderBy("term").select("term", "tf", "weight")
      .as[(String, Long, Double)].collect()
    rel.map(_._1).toSeq shouldBe Seq("an", "ba", "na")
    rel.map(_._2).toSeq shouldBe Seq(2L, 1L, 2L)
    rel.map(_._3).toSeq.zip(Seq(2.0 / 3, 1.0 / 3, 2.0 / 3)).foreach { case (a, b) => a shouldBe b +- 1e-12 }
  }

  test("F1 DataFrame fast path: charBigramTfRelation matches the fitted-model relation") {
    val df = Seq((0L, "banana"), (1L, "bandana"), (2L, "x"), (3L, "")).toDF("id", "mention")
    val model = FeaturePipelines.charBigramTf("mention", "features").fit(df)
    val viaModel = FeaturePipelines.charBigramRelation(model, df, "id")
      .select("id", "term", "tf", "weight")
      .as[(Long, String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val direct = FeaturePipelines.charBigramTfRelation(df, "id", "mention")
      .as[(Long, String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    direct.map(r => (r._1, r._2, r._3)) shouldBe viaModel.map(r => (r._1, r._2, r._3))
    direct.map(_._4).zip(viaModel.map(_._4)).foreach { case (a, b) => a shouldBe b +- 1e-12 }
  }

  test("F1 fast path truncation: vocab is the deterministic top-K by total corpus tf") {
    // totals: an=4 (2+2), na=3 (2+1), ba=2, nd=1, da=1 — vocabSize=2
    // keeps {an, na}; rows for out-of-vocab terms are filtered but
    // weights still normalize over the doc's FULL term set (the same
    // semantics as the fitted-model relation)
    val df = Seq((0L, "banana"), (1L, "bandana")).toDF("id", "mention")
    val out = FeaturePipelines.charBigramTfRelation(df, "id", "mention", vocabSize = 2)
      .as[(Long, String, Long, Double)].collect().toSeq
    out.map(_._2).toSet shouldBe Set("na", "an")
    out.map(r => (r._1, r._2, r._3)).sorted shouldBe
      Seq((0L, "an", 2L), (0L, "na", 2L), (1L, "an", 2L), (1L, "na", 1L))
  }

  test("F3 persistence: pipeline save/load roundtrip transforms identically") {
    val df = Seq((0L, "banana"), (1L, "bandana")).toDF("id", "mention")
    val model = FeaturePipelines.charBigramTf("mention", "features").fit(df)
    val dir = Files.createTempDirectory("graft-pipe").toString + "/model"
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = model.transform(df).select("id", "features").collect().map(_.toString).sorted
    val b = loaded.transform(df).select("id", "features").collect().map(_.toString).sorted
    a shouldBe b
  }

  test("F2 word TF-IDF: document frequencies are per-doc distinct counts") {
    val df = Seq((0L, "a b a"), (1L, "a c"), (2L, "c c d")).toDF("id", "text")
    val model = FeaturePipelines.wordTfIdf("text", "features").fit(df)
    val dfs = FeaturePipelines.docFreqRelation(model, spark)
      .orderBy("term").as[(String, Long)].collect().toSeq
    dfs shouldBe Seq(("a", 2L), ("b", 1L), ("c", 2L), ("d", 1L))
  }

  test("multimodal stub decode is deterministic with the declared shape") {
    val bytes = "hello".getBytes("UTF-8")
    val f1 = Multimodal.stubDecode(bytes, 4)
    val f2 = Multimodal.stubDecode(bytes, 4)
    f1.toSeq shouldBe f2.toSeq
    f1.length shouldBe 4
    all(f1.toSeq) should (be >= 0f and be < 1f)
    Multimodal.stubDecode("other".getBytes("UTF-8"), 4).toSeq should not be f1.toSeq
  }

  test("frame sampling keeps every stride-th fixed-size chunk") {
    val df = Seq((0L, Array.tabulate(32)(_.toByte))).toDF("id", "content")
    val out = Multimodal.sampleFrames(df, frameBytes = 4, stride = 2)
      .orderBy("frame_idx").select("frame_idx").as[Long].collect().toSeq
    out shouldBe Seq(0L, 2L, 4L, 6L) // 8 chunks, every 2nd
  }

  test("resizeMeta preserves aspect ratio under a max side") {
    val df = Seq((1920, 1080), (640, 480), (100, 50)).toDF("width", "height")
    val out = Multimodal.resizeMeta(df, maxSide = 960)
      .select("out_width", "out_height").as[(Int, Int)].collect().toSeq
    out shouldBe Seq((960, 540), (640, 480), (100, 50))
  }
}
