package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Grinch, Metrics, Trees}
import graft.sources.Sources

/** E3 shape end-to-end (SURVEY §3): embeddings → GRINCH dendrogram →
  * TSV sink → TSV source → cut-tree flat clustering → metric eval —
  * every stage through the real file contract.
  */
class PipelineE3Spec extends SparkSpec {
  import spark.implicits._

  test("E3: grinch -> dendrogram TSV roundtrip -> cutTree -> full metric summary") {
    // two separable entity clusters, interleaved arrival
    val pts = Seq(
      (0L, Array(1f, 0f, 0f), "E1"), (1L, Array(0f, 0f, 1f), "E2"),
      (2L, Array(0.95f, 0.05f, 0f), "E1"), (3L, Array(0f, 0.05f, 0.95f), "E2"),
      (4L, Array(0.9f, 0.1f, 0f), "E1"), (5L, Array(0f, 0.1f, 0.9f), "E2"))
    val df = pts.toDF("vec_id", "embedding", "entity")

    // 1. build + sink the dendrogram
    val tree = Grinch.dendrogram(df, col("vec_id"), col("embedding"), col("vec_id"),
      col("entity"), Grinch.Params())
    val dir = Files.createTempDirectory("graft-e3").toString + "/tree"
    Sources.writeDendrogramTsv(tree, dir)

    // 2. read it back, cut at threshold with bottom-up propagation
    val nodes = Sources.readDendrogramTsv(spark, dir).collect()
      .map(r => Trees.TreeNode(r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
      .toSeq
    val emb = pts.map { case (id, v, _) => id.toString -> v }.toMap
    val cut = Trees.cutTree(nodes, emb, threshold = 0.5)

    // 3. purity + full metric summary against gold entities
    Trees.dendrogramPurity(nodes) shouldBe 1.0 +- 1e-12
    val assign = pts.map { case (id, _, e) => (e, cut(id.toString)) }.toDF("t", "p")
    val summary = Metrics.evalSummary(assign, col("t"), col("p")).collect().head
    summary.getAs[Double]("muc_f1") shouldBe 1.0 +- 1e-9
    summary.getAs[Double]("b3_f1") shouldBe 1.0 +- 1e-6
    summary.getAs[Double]("ceafe_f1") shouldBe 1.0 +- 1e-9
    summary.getAs[Double]("mean_f1") shouldBe 1.0 +- 1e-6
    summary.getAs[Long]("n_true_clusters") shouldBe 2L
    summary.getAs[Long]("n_pred_clusters") shouldBe 2L
    summary.getAs[Double]("median_true_size") shouldBe 3.0 +- 1e-12
  }
}
