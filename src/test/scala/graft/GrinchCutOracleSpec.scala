package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.collection.mutable
import scala.util.Random

import graft.operators.Grinch

/** Pins the h10 oracle model: the C18 threshold cut
  * (`/root/reference/meercat/grinch_alg.py:618-631`) over a
  * graft-built tree reads ONLY final-state information. The engine's
  * `getScore` is memoized, but `updatedFromChildren` resets a node's
  * cached score whenever anything in its subtree changes
  * (`grinch_alg.py:472-479`), so every score the cut compares against
  * θ equals a fresh double dot of the node's FINAL float32 child
  * centroids f32(intSum/nd) — exactly what h10's cut CTE computes from
  * the replayed `fin` state.
  *
  * The model here is deliberately NOT the h9 replay: it reconstructs
  * (nd, subtreeSum) from scratch out of the final parent array by
  * accumulating each leaf up its ancestor chain, so a bookkeeping bug
  * that corrupted the engine's incremental sums AND its replay twin
  * identically would still be caught. Cluster labels are canonicalized
  * to each cluster's minimum member id on both sides (the reference's
  * BFS discovery numbering depends on mutable children-LIST order,
  * which graft surgery's remove-then-append reorders; the partition is
  * the cut's semantics and is compared exactly).
  */
class GrinchCutOracleSpec extends AnyFunSuite with Matchers {

  /** Fresh-state cut model: leaf -> min-member-id cluster label. */
  private def cutModel(q: Array[Array[Long]], par: Array[Int], theta: Double)
    : Map[Int, Int] = {
    val n = q.length
    val dim = q(0).length
    val total = par.length
    val nd = Array.fill(total)(0L)
    val ss = Array.ofDim[Long](total, dim)
    for (leaf <- 0 until n) {
      var c = leaf
      while (c != -1) {
        nd(c) += 1
        var k = 0
        while (k < dim) { ss(c)(k) += q(leaf)(k); k += 1 }
        c = par(c)
      }
    }
    val children = Array.fill(total)(List.empty[Int])
    for (x <- 0 until total if par(x) >= 0)
      children(par(x)) = x :: children(par(x))
    def cent(x: Int): Array[Float] =
      ss(x).map(s => (s.toFloat.toDouble / nd(x).toDouble).toFloat)
    def ddot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var k = 0
      while (k < a.length) { s += a(k).toDouble * b(k).toDouble; k += 1 }
      s
    }
    def score(x: Int): Double = ddot(cent(children(x).head), cent(children(x)(1)))
    val root = (0 until total).find(x => par(x) == -1 && nd(x) > 0).get
    val frontier = mutable.Queue(root)
    val clusterRoots = mutable.ArrayBuffer.empty[Int]
    while (frontier.nonEmpty) {
      val x = frontier.dequeue()
      if (children(x).nonEmpty && score(x) < theta) children(x).foreach(frontier.enqueue)
      else clusterRoots += x
    }
    val out = mutable.Map.empty[Int, Int]
    clusterRoots.foreach { c =>
      val members = mutable.ArrayBuffer.empty[Int]
      val fr = mutable.Queue(c)
      while (fr.nonEmpty) {
        val y = fr.dequeue()
        if (children(y).isEmpty) members += y else children(y).foreach(fr.enqueue)
      }
      val label = members.min
      members.foreach(m => out(m) = label)
    }
    out.toMap
  }

  /** Node scores of the final tree, via the same fresh reconstruction
    * — used to place per-case thresholds at meaningful quantiles.
    */
  private def nodeScores(q: Array[Array[Long]], par: Array[Int]): Seq[Double] = {
    val n = q.length
    val dim = q(0).length
    val total = par.length
    val nd = Array.fill(total)(0L)
    val ss = Array.ofDim[Long](total, dim)
    for (leaf <- 0 until n) {
      var c = leaf
      while (c != -1) {
        nd(c) += 1
        var k = 0
        while (k < dim) { ss(c)(k) += q(leaf)(k); k += 1 }
        c = par(c)
      }
    }
    val children = Array.fill(total)(List.empty[Int])
    for (x <- 0 until total if par(x) >= 0)
      children(par(x)) = x :: children(par(x))
    def cent(x: Int): Array[Float] =
      ss(x).map(s => (s.toFloat.toDouble / nd(x).toDouble).toFloat)
    (n until total).filter(children(_).nonEmpty).map { x =>
      val a = cent(children(x).head); val b = cent(children(x)(1))
      var s = 0.0; var k = 0
      while (k < dim) { s += a(k).toDouble * b(k).toDouble; k += 1 }
      s
    }
  }

  private def canonical(assign: Array[Int]): Map[Int, Int] = {
    val byCluster = assign.zipWithIndex.groupBy(_._1)
    byCluster.values.flatMap { members =>
      val ids = members.map(_._2)
      val label = ids.min
      ids.map(_ -> label)
    }.toMap
  }

  private def uniformPts(rnd: Random, n: Int, dim: Int): Array[Array[Long]] =
    Array.fill(n)(Array.fill(dim)((rnd.nextInt(127) - 63).toLong))

  private def clusteredPts(rnd: Random, n: Int, dim: Int): Array[Array[Long]] = {
    val centers = Array.fill(4)(Array.fill(dim)((rnd.nextInt(127) - 63).toLong))
    Array.fill(n) {
      val c = centers(rnd.nextInt(centers.length))
      c.map(v => (v + rnd.nextInt(11) - 5).max(-63).min(63))
    }
  }

  /** Runs one config at three score-quantile thresholds; returns the
    * number of non-trivial cuts (1 < clusters < n).
    */
  private def runCase(seed: Int, n: Int, dim: Int, cap: Int, clustered: Boolean): Int = {
    val rnd = new Random(seed)
    val ptsL = if (clustered) clusteredPts(rnd, n, dim) else uniformPts(rnd, n, dim)
    val g = new Grinch(ptsL.map(_.map(_.toFloat)), rotateCap = 0, graftCap = cap,
      sim = "dot", norm = "none")
    g.buildDendrogram()
    val par = g.rawParents
    val scs = nodeScores(ptsL, par).sorted
    var nontrivial = 0
    for (qt <- Seq(0.25, 0.5, 0.75)) {
      val theta = scs((qt * (scs.length - 1)).toInt)
      val model = cutModel(ptsL, par, theta)
      val engine = canonical(g.flatClustering(theta))
      withClue(s"seed=$seed n=$n cap=$cap clustered=$clustered theta=$theta: ") {
        engine shouldBe model
      }
      val k = model.values.toSet.size
      if (k > 1 && k < n) nontrivial += 1
    }
    nontrivial
  }

  test("threshold cut of graft-built trees equals the fresh-state model (h10 oracle)") {
    var nontrivial = 0
    for (cap <- Seq(3, 6); seed <- 1 to 30) {
      nontrivial += runCase(seed, n = 60, dim = 8, cap = cap, clustered = false)
      nontrivial += runCase(seed, n = 60, dim = 8, cap = cap, clustered = true)
    }
    // quantile thresholds must mostly yield real multi-cluster cuts,
    // or the sweep proves little about the descend-vs-stop branch
    nontrivial should be > 300
  }

  test("h10-shaped case (n=200, cap=8, ±63 quantization) matches the model at quantile cuts") {
    val rnd = new Random(11)
    val pts = clusteredPts(rnd, 200, 8)
    val g = new Grinch(pts.map(_.map(_.toFloat)), rotateCap = 0, graftCap = 8,
      sim = "dot", norm = "none")
    g.buildDendrogram()
    val scs = nodeScores(pts, g.rawParents).sorted
    val theta = scs(scs.length / 2)
    val assign = g.flatClustering(theta)
    canonical(assign) shouldBe cutModel(pts, g.rawParents, theta)
    val sizes = assign.groupBy(identity).values.map(_.length)
    sizes.size should be > 1
    sizes.max should be > 1
  }

  /** h11's fresh-state cut model for MEMORY-BOUNDED trees: centroids
    * from the final (parents, activeLeaves) state alone —
    *  - original leaf: its own point;
    *  - EVER-PRUNED slot (>= n with an active slot at-or-self-or-above,
    *    the only way a unit ends up below the active frontier): frozen
    *    trueSubtreeSum/2;
    *  - ordinary internal: trueSubtreeSum / (active slots in subtree)
    *    — the stored descendant count under the prune convention.
    */
  private def cutModelPruned(q: Array[Array[Long]], par: Array[Int],
                             act: Array[Boolean], theta: Double): Map[Int, Int] = {
    val n = q.length
    val dim = q(0).length
    val total = par.length
    val trueSum = Array.ofDim[Long](total, dim)
    for (leaf <- 0 until n) {
      var c = leaf
      while (c != -1) {
        var k = 0
        while (k < dim) { trueSum(c)(k) += q(leaf)(k); k += 1 }
        c = par(c)
      }
    }
    val actUnder = Array.fill(total)(0L)
    for (a <- 0 until total if act(a)) {
      var c = a
      while (c != -1) { actUnder(c) += 1; c = par(c) }
    }
    def evp(x: Int): Boolean = {
      if (x < n) return false
      var c = x
      while (c != -1) { if (act(c)) return true; c = par(c) }
      false
    }
    val children = Array.fill(total)(List.empty[Int])
    for (x <- 0 until total if par(x) >= 0)
      children(par(x)) = x :: children(par(x))
    def cent(x: Int): Array[Float] = {
      val d = if (x < n) 1.0 else if (evp(x)) 2.0 else actUnder(x).toDouble
      trueSum(x).map(s => (s.toFloat.toDouble / d).toFloat)
    }
    def ddot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var k = 0
      while (k < a.length) { s += a(k).toDouble * b(k).toDouble; k += 1 }
      s
    }
    def score(x: Int): Double = ddot(cent(children(x).head), cent(children(x)(1)))
    val root = (0 until total).find(par(_) == -1).get
    val frontier = mutable.Queue(root)
    val clusterRoots = mutable.ArrayBuffer.empty[Int]
    while (frontier.nonEmpty) {
      val x = frontier.dequeue()
      if (children(x).nonEmpty && score(x) < theta) children(x).foreach(frontier.enqueue)
      else clusterRoots += x
    }
    val out = mutable.Map.empty[Int, Int]
    clusterRoots.foreach { c =>
      val members = mutable.ArrayBuffer.empty[Int]
      val fr = mutable.Queue(c)
      while (fr.nonEmpty) {
        val y = fr.dequeue()
        if (children(y).isEmpty) members += y else children(y).foreach(fr.enqueue)
      }
      val label = members.min
      members.foreach(m => out(m) = label)
    }
    out.toMap
  }

  /** Internal-node scores of a pruned tree via the same model. */
  private def nodeScoresPruned(q: Array[Array[Long]], par: Array[Int],
                               act: Array[Boolean]): Seq[Double] = {
    val n = q.length
    val dim = q(0).length
    val total = par.length
    val trueSum = Array.ofDim[Long](total, dim)
    for (leaf <- 0 until n) {
      var c = leaf
      while (c != -1) {
        var k = 0
        while (k < dim) { trueSum(c)(k) += q(leaf)(k); k += 1 }
        c = par(c)
      }
    }
    val actUnder = Array.fill(total)(0L)
    for (a <- 0 until total if act(a)) {
      var c = a
      while (c != -1) { actUnder(c) += 1; c = par(c) }
    }
    def evp(x: Int): Boolean = {
      if (x < n) return false
      var c = x
      while (c != -1) { if (act(c)) return true; c = par(c) }
      false
    }
    val children = Array.fill(total)(List.empty[Int])
    for (x <- 0 until total if par(x) >= 0)
      children(par(x)) = x :: children(par(x))
    def cent(x: Int): Array[Float] = {
      val d = if (x < n) 1.0 else if (evp(x)) 2.0 else actUnder(x).toDouble
      trueSum(x).map(s => (s.toFloat.toDouble / d).toFloat)
    }
    (n until total).filter(children(_).nonEmpty).map { x =>
      val a = cent(children(x).head); val b = cent(children(x)(1))
      var s = 0.0; var k = 0
      while (k < dim) { s += a(k).toDouble * b(k).toDouble; k += 1 }
      s
    }
  }

  test("threshold cut of MEMORY-BOUNDED trees equals the final-state model (h11 oracle)") {
    var nontrivial = 0
    for (limit <- Seq(8, 16); strategy <- Seq("least_recent", "similarity"); seed <- 1 to 15) {
      val rnd = new Random(seed)
      val pts = if (seed % 2 == 0) clusteredPts(rnd, 60, 8) else uniformPts(rnd, 60, 8)
      val g = new Grinch(pts.map(_.map(_.toFloat)), rotateCap = 0, graftCap = 0,
        sim = "dot", norm = "none", activeLeafLimit = limit, pruningStrategy = strategy)
      g.buildDendrogram()
      g.prunes should be > 0 // the memory bound must actually fire
      val act = g.rawActiveLeaves
      val par = g.rawParents
      val scs = nodeScoresPruned(pts, par, act).sorted
      for (qt <- Seq(0.25, 0.5, 0.75)) {
        val theta = scs((qt * (scs.length - 1)).toInt)
        val model = cutModelPruned(pts, par, act, theta)
        val engine = canonical(g.flatClustering(theta))
        withClue(s"seed=$seed limit=$limit strategy=$strategy theta=$theta: ") {
          engine shouldBe model
        }
        val k = model.values.toSet.size
        if (k > 1 && k < pts.length) nontrivial += 1
      }
    }
    nontrivial should be > 120
  }

  test("h11 driver query (θ=4600, sf0.01) cuts the pruned tree across internal boundaries") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val out = QueriesGrinch.queries("h11_grinch_prune_cut")(SparkSpec.session, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out.length shouldBe 200
    val sizes = out.groupBy(_._2).values.map(_.length)
    sizes.size should be > 1
    sizes.size should be < out.length
    sizes.max should be > 1
    out.groupBy(_._2).foreach { case (label, members) =>
      members.map(_._1).min shouldBe label
    }
  }

  test("h10 driver query (θ=700, sf0.01) cuts across internal boundaries") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val out = QueriesGrinch.queries("h10_grinch_tree_cut")(SparkSpec.session, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out.length shouldBe 200
    val sizes = out.groupBy(_._2).values.map(_.length)
    // not all-singletons, not one-cluster: the constant threshold must
    // make the BFS both descend past internal nodes and stop at some
    sizes.size should be > 1
    sizes.size should be < out.length
    sizes.max should be > 1
    // each cluster is labeled by its minimum member vec_id
    out.groupBy(_._2).foreach { case (label, members) =>
      members.map(_._1).min shouldBe label
    }
  }
}
