package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.operators.{Grinch, Trees}

class GrinchSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated unit directions in 4D with small deterministic
    * jitter, interleaved — rotate/graft must untangle the arrival order.
    */
  private def twoClusterPoints(nPer: Int): (Array[Array[Float]], Array[Int]) = {
    val rnd = new Random(7)
    def jitter(base: Array[Float]): Array[Float] = {
      val v = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 0f, 0f, 1f)
    val pts = Array.tabulate(2 * nPer)(i => if (i % 2 == 0) jitter(a) else jitter(b))
    val labels = Array.tabulate(2 * nPer)(i => i % 2)
    (pts, labels)
  }

  test("GRINCH separates two interleaved clusters (purity 1.0, 2 flat clusters)") {
    val (pts, labels) = twoClusterPoints(10)
    val g = new Grinch(pts)
    g.buildDendrogram()
    val tree = g.treeNodes(i => Some(labels(i).toString))
    Trees.dendrogramPurity(tree) shouldBe 1.0 +- 1e-12

    val assign = g.flatClustering(0.5)
    assign.distinct.length shouldBe 2
    // all same-label points share a cluster
    (0 until pts.length).groupBy(labels(_)).values.foreach { idxs =>
      idxs.map(assign(_)).distinct.length shouldBe 1
    }
  }

  test("active-leaf budget triggers pruning but every point stays assigned") {
    val (pts, _) = twoClusterPoints(12)
    val g = new Grinch(pts, activeLeafLimit = 6)
    g.buildDendrogram()
    val assign = g.flatClustering(0.5)
    assign.length shouldBe pts.length
    all(assign.toSeq) should be >= 0
    assign.distinct.length shouldBe 2
  }

  test("similarity-based pruning strategy also keeps the tree consistent") {
    val (pts, _) = twoClusterPoints(10)
    val g = new Grinch(pts, activeLeafLimit = 5, pruningStrategy = "similarity")
    g.buildDendrogram()
    val assign = g.flatClustering(0.5)
    all(assign.toSeq) should be >= 0
  }

  test("dendrogram relation is a well-formed binary tree") {
    val (pts, labels) = twoClusterPoints(8)
    val g = new Grinch(pts)
    g.buildDendrogram()
    val tree = g.treeNodes(i => Some(labels(i).toString))
    tree.count(_.parentUid.isEmpty) shouldBe 1 // one root
    val childCount = tree.flatMap(_.parentUid).groupBy(identity).view.mapValues(_.size)
    all(childCount.values.toSeq) shouldBe 2 // strictly binary
    tree.count(_.label.isDefined) shouldBe pts.length
  }

  test("dendrogramAndClusters keeps node uids and point ids in separate columns") {
    val (pts, labels) = twoClusterPoints(8)
    // non-slot point ids (i*10+3) so a node/point id-space mixup cannot
    // accidentally line up
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong * 10 + 3, v, i.toLong, labels(i).toString) }
      .toSeq.toDF("id", "vec", "ord", "lab")
    val both = Grinch.dendrogramAndClusters(df, col("id"), col("vec"), col("ord"),
      col("lab"), Grinch.Params(), clusters = Some((Some(0.5), 0L)))
    val nodes = both.where(col("kind") === "node")
    val pairs = both.where(col("kind") === "pair")
    nodes.where(col("node_uid").isNull || col("point_id").isNotNull).count() shouldBe 0L
    pairs.where(col("point_id").isNull || col("node_uid").isNotNull).count() shouldBe 0L
    // pair rows carry the caller's ORIGINAL ids, one per input point
    pairs.select("point_id").as[Long].collect().sorted.toSeq shouldBe
      (0 until pts.length).map(_.toLong * 10 + 3)
    // node leaf slots are stream positions [0, n) — disjoint space
    nodes.where(col("label").isNotNull).count() shouldBe pts.length.toLong
  }

  test("flatCluster Spark operator matches the driver-side automaton") {
    val (pts, _) = twoClusterPoints(8)
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "vec")
    val out = Grinch.flatCluster(df, col("id"), col("vec"), col("id"), Grinch.Params(), 0.5)
      .orderBy("id").select("pred_cluster").as[Long].collect()
    val g = new Grinch(pts)
    g.buildDendrogram()
    out.map(_.toInt).toSeq shouldBe g.flatClustering(0.5).toSeq
  }

  /** Pins the h5 oracle model: with rotateCap=0, graftCap=0,
    * norm="none", sim="dot" and no pruning, the automaton's tree equals
    * the closed-form insert-log replay (sib_i = integer-dot argmax over
    * prior leaves with lowest-id ties; parent(leaf j) = node of the
    * last event at j; parent(p_i) = node of the previous event at
    * sib_i) — the exact relation the h5 DuckDB oracle evaluates.
    *
    * Reference provenance: executing `/root/reference/meercat/
    * grinch_alg.py` itself (scipy/tqdm stubbed) with rotate_cap=0,
    * graft_cap=0, sim='dot', norm='none' on THIS EXACT fixture (the
    * java-LCG `Random(13)` vectors, regenerated bit-for-bit by
    * `scripts/gen_grinch_goldens.py`) produces the parent relation in
    * `grinch_ref_parents.tsv` (key h5_seed13_n60_d8_cap0), asserted
    * below across all 119 nodes — so the h5 oracle is a check against
    * the reference's own code on the same data, not just against this
    * port.
    */
  test("restricted integer config equals the closed-form insert-log replay") {
    val rnd = new Random(13)
    val n = 60; val dim = 8
    val pts = Array.fill(n)(Array.fill(dim)((rnd.nextInt(255) - 127).toFloat))
    val g = new Grinch(pts, rotateCap = 0, graftCap = 0, sim = "dot", norm = "none")
    g.buildDendrogram()
    val got = g.treeNodes(_ => None).map(t => t.uid.toInt -> t.parentUid.map(_.toInt)).toMap

    def idot(a: Array[Float], b: Array[Float]): Long =
      (0 until dim).map(k => a(k).toLong * b(k).toLong).sum
    val sib = Array.fill(n)(-1)
    for (i <- 1 until n) {
      var best = 0; var bestD = Long.MinValue
      for (j <- 0 until i) {
        val d = idot(pts(i), pts(j)); if (d > bestD) { bestD = d; best = j }
      }
      sib(i) = best
    }
    val expected = Map.newBuilder[Int, Option[Int]]
    for (j <- 0 until n) {
      val events = (1 until n).filter(sib(_) == j) ++ (if (j >= 1) Seq(j) else Seq.empty)
      expected += j -> Some(n + events.max - 1)
    }
    for (i <- 1 until n) {
      val prior = (1 until i).filter(sib(_) == sib(i)) ++
        (if (sib(i) >= 1) Seq(sib(i)) else Seq.empty)
      expected += (n + i - 1) -> (if (prior.isEmpty) None else Some(n + prior.max - 1))
    }
    got.size shouldBe 2 * n - 1
    got shouldBe expected.result()

    // same-data reference execution (see provenance note above)
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/grinch_ref_parents.tsv"), "UTF-8")
    val ref = try src.getLines()
      .map(_.split('\t')).collectFirst {
        case Array("h5_seed13_n60_d8_cap0", v) => v.split(',').map(_.toInt)
      }.get
    finally src.close()
    (0 until 2 * n - 1).foreach { uid => got(uid).getOrElse(-1) shouldBe ref(uid) }

    // fixed-point purity (h6's metric) tracks the float fold within the
    // 1e-9 truncation bound on the same mixed-label tree
    val tree = g.treeNodes(i => Some((i % 3).toString))
    val (sm, ps) = Trees.dendrogramPurityFixedPoint(tree)
    ps should be > 0L
    val fp = sm.toDouble / (1e9 * ps.toDouble)
    fp shouldBe Trees.dendrogramPurity(tree) +- 1e-9
  }

  test("cutTree reproduces the flat clustering on a toy tree") {
    import Trees.TreeNode
    // tree: root R with children A (leaves a1,a2 similar) and b
    val nodes = Seq(
      TreeNode("R", None, None),
      TreeNode("A", Some("R"), None),
      TreeNode("a1", Some("A"), Some("x")),
      TreeNode("a2", Some("A"), Some("x")),
      TreeNode("b", Some("R"), Some("y")))
    val emb = Map(
      "a1" -> Array(1f, 0f), "a2" -> Array(0.9f, 0.1f), "b" -> Array(0f, 1f))
    val cut = Trees.cutTree(nodes, emb, threshold = 0.5)
    cut("a1") shouldBe cut("a2")
    cut("a1") should not be cut("b")
  }
}
