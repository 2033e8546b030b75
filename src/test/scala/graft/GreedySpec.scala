package graft

import org.apache.spark.sql.functions._

import graft.operators.GreedyClustering
import graft.operators.GreedyClustering.Params

/** Pins the order-dependent clustering semantics. The first case is the
  * reference's own golden (`/root/reference/tests/nn_thresh_test.py:8-18`);
  * the strategy cases are hand-derived from the reference's eviction
  * rules (`meercat/nn_thresh.py:44-101`).
  */
class GreedySpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[Array[Float]], p: Params): Seq[Long] = {
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    GreedyClustering.clusterSorted(df, col("id"), col("vec"), col("id"), p)
      .orderBy("id").select("pred_cluster").as[Long].collect().toSeq
  }

  val oneHot = Seq(
    Array(1f, 0f), Array(0f, 1f), Array(1f, 0f), Array(1f, 0f), Array(0f, 1f))

  test("reference golden: backwards-unlimited, theta 0.5 -> [0,1,0,0,1]") {
    run(oneHot, Params("backwards", -1, 0.5, cosine = false)) shouldBe Seq(0L, 1L, 0L, 0L, 1L)
  }

  test("backwards with window limit 1 forgets older links") {
    // row 3 links to row 2 (same vector, within window); row 2's cluster
    // root is 0, so transitivity via the stored cluster id still holds
    run(oneHot, Params("backwards", 1, 0.5, cosine = false)) shouldBe Seq(0L, 1L, 2L, 2L, 4L)
  }

  test("diversity eviction drops the most-similar stored row") {
    // limit=2: after row1, store={0,1} hits limit -> evict most similar
    // to current (row0); after row2, store={1,2} -> evict row1
    val vecs = Seq(Array(1f, 0f), Array(0f, 1f), Array(1f, 0f))
    run(vecs, Params("diversity", 2, 0.5, cosine = false)) shouldBe Seq(0L, 1L, 2L)
  }

  test("cache eviction is least-recently-linked") {
    val vecs = Seq(Array(1f, 0f), Array(0f, 1f), Array(0f, 1f), Array(1f, 0f))
    // step1: store full -> evict 0 (never linked); step2: 2 links to 1 ->
    // cluster 1; evict 1; step3: store={2}, no link -> singleton 3
    run(vecs, Params("cache", 2, 0.5, cosine = false)) shouldBe Seq(0L, 1L, 1L, 3L)
  }

  test("clusterByKey runs independent streams per key") {
    val df = Seq(
      (0L, 0L, Array(1f, 0f)), (0L, 1L, Array(1f, 0f)),
      (1L, 2L, Array(1f, 0f)), (1L, 3L, Array(1f, 0f)))
      .toDF("label", "id", "vec")
    val out = GreedyClustering.clusterByKey(df, col("label"), col("id"), col("vec"), col("id"),
      Params("backwards", -1, 0.5, cosine = false))
      .orderBy("id").select("pred_cluster").as[Long].collect().toSeq
    out shouldBe Seq(0L, 0L, 2L, 2L) // key 1's stream does NOT link to key 0's rows
  }

  test("findThreshold bisects to the target cluster count") {
    // 6 one-hot rows in 3 dims -> 3 natural clusters at any theta in (0,1)
    val vecs = Seq(
      Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f),
      Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val (_, n) = GreedyClustering.findThreshold(
      df, col("id"), col("vec"), col("id"),
      Params("backwards", -1, 0.5, cosine = false), target = 3, maxIters = 20)
    n shouldBe 3L
  }
}
