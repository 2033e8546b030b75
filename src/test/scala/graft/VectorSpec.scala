package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.95f, 0.05f)),
    (4L, Array(0.0f, 0.0f, 1.0f)))

  test("dotProduct / l2Norm / cosine basics") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dotProduct(col("a"), col("b")),
      VectorFunctions.l2Norm(col("a")),
      VectorFunctions.cosine(col("a"), col("a"))).collect().head
    r.getDouble(0) shouldBe 32.0 +- 1e-12
    r.getDouble(1) shouldBe math.sqrt(14.0) +- 1e-12
    r.getDouble(2) shouldBe 1.0 +- 1e-12
  }

  test("l2Normalize produces unit vectors (norm hoisted, O(d))") {
    val df = Seq(Array(3.0f, 4.0f)).toDF("v")
      .select(VectorFunctions.l2Normalize(col("v")).as("n"))
    val n = df.collect().head.getSeq[Float](0)
    n(0) shouldBe 0.6f +- 1e-6f
    n(1) shouldBe 0.8f +- 1e-6f
  }

  test("rhpSignature is within [0, 2^bits) and deterministic") {
    val df = vecs.toDF("id", "v")
      .select(VectorFunctions.rhpSignature(col("v"), 8, 3).as("b"))
    val buckets = df.collect().map(_.getLong(0))
    all(buckets) should be >= 0L
    all(buckets) should be < 256L
    val again = df.collect().map(_.getLong(0))
    buckets shouldBe again
  }

  test("cosineTopK: nearest neighbor is the almost-parallel vector, self excluded") {
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(df, df.where(col("vec_id") === 0), col("vec_id"), col("embedding"), 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    out.head shouldBe ((0L, 1L, 1L))
    out.map(_._2) should not contain 0L
  }

  test("gramPairs emits each unordered pair once") {
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.gramPairs(df, col("vec_id"), col("embedding")).collect()
    out.length shouldBe 10 // C(5,2)
  }
}
