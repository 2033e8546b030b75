package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.util.Random

import graft.operators.Grinch

/** Pins the h9 oracle model: with rotateCap = 0, graftCap = G > 0,
  * sim = "dot", norm = "none" and no pruning, the GRINCH automaton
  * (`/root/reference/meercat/grinch_alg.py:166-202` + graft
  * `:308-387`) is replayable by an EAGER state machine — per slot only
  * (parent, two children, descendant count, integer subtree sum):
  *
  *  - the lazy maintenance is semantically transparent in this config:
  *    every chain that changes a node's subtree also invalidates its
  *    cached score and flags it (updated_from_children runs along
  *    contiguous ancestor chains, `:472-479`), so every score the
  *    automaton compares equals the eager recompute from current
  *    children — replayed as double dots of float32 centroids
  *    f32(intSum/nd), exactly like h7;
  *  - graft (`:308-387`): cknn of the new parent's centroid over
  *    leaves minus its leaf descendants and its sibling-if-leaf;
  *    LCA ancestor chains filtered nd < graftCap; the M×N masked
  *    row-major argmax; the detach (lazy -2 slot, sibling promoted)
  *    and re-splice; then the two ancestor-chain updates — equivalent
  *    (validated recompute-vs-delta over all 120 cases in the
  *    prototype) to ±(nd, subtreeSum) of the grafted node along the
  *    old and new chains up to, excluding, the LCA.
  *
  * This spec proves ENGINE == replay slot-for-slot (including -2
  * lazy-delete codes and slot allocation order). Agreement with the
  * reference implementation is deliberately pinned at the live-
  * hierarchy level instead, by GrinchGraftPropertySpec: the
  * reference's float32 batched score path performs occasional no-op
  * "churn" grafts (one-ULP ties) that allocate extra slots without
  * changing the clustering, so slot-level reference identity does not
  * hold in general — on this spec's 120 configs the engine replays
  * 3,427 grafts.
  */
class GrinchGraftOracleSpec extends AnyFunSuite with Matchers {

  /** The h9 replay. Returns (parent per allocated slot — -1 root, -2
    * lazily deleted; graft count).
    */
  private[graft] def graftReplay(q: Array[Array[Long]], graftCap: Int)
    : (Array[Int], Int) = {
    val n = q.length
    val dim = q(0).length
    val total = 3 * n
    val par = Array.fill(total)(-1)
    val ch = Array.fill(total)(List.empty[Int])
    val nd = Array.fill(total)(0L)
    val ss = Array.ofDim[Long](total, dim)
    var nxt = n
    var grafts = 0

    def idot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var k = 0
      while (k < dim) { s += a(k) * b(k); k += 1 }
      s
    }
    def cent(x: Int): Array[Float] =
      ss(x).map(s => (s.toFloat.toDouble / nd(x).toDouble).toFloat)
    def ddot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var k = 0
      while (k < dim) { s += a(k).toDouble * b(k).toDouble; k += 1 }
      s
    }
    def eScore(a: Int, b: Int): Double = ddot(cent(a), cent(b))
    def getScore(p: Int): Double = eScore(ch(p).head, ch(p)(1))
    def chain(x: Int): List[Int] = {
      var out = List.newBuilder[Int]
      var c = par(x)
      while (c != -1) { out += c; c = par(c) }
      out.result()
    }
    def isLeafDesc(j: Int, node: Int): Boolean = {
      var c = j
      while (c != -1) { if (c == node) return true; c = par(c) }
      false
    }

    for (i <- 0 until n) {
      nd(i) = 1
      Array.copy(q(i), 0, ss(i), 0, dim)
      if (i > 0) {
        var sib = -1; var best = Long.MinValue
        for (j <- 0 until i) {
          val d = idot(q(i), q(j)); if (d > best) { best = d; sib = j }
        }
        val m = nxt; nxt += 1
        val g = par(sib)
        par(m) = g
        if (g != -1) ch(g) = ch(g).map(c => if (c == sib) m else c)
        ch(m) = List(sib, i)
        par(sib) = m; par(i) = m
        nd(m) = nd(sib) + 1
        var k = 0
        while (k < dim) { ss(m)(k) = ss(sib)(k) + q(i)(k); k += 1 }
        chain(m).foreach { x =>
          nd(x) += 1
          var k2 = 0
          while (k2 < dim) { ss(x)(k2) += q(i)(k2); k2 += 1 }
        }
        // ---- graft(m), `grinch_alg.py:308-387`
        val off2: Set[Int] =
          if (par(m) != -1) {
            val s = ch(par(m)).find(_ != m).get
            if (s < n) Set(s) else Set.empty
          } else Set.empty
        val cm = cent(m)
        var oneNN = -1; var bestD = Double.NegativeInfinity
        for (j <- 0 to i) {
          if (!off2.contains(j) && !isLeafDesc(j, m)) {
            val d = ddot(cm, q(j).map(_.toFloat))
            if (d > bestD) { bestD = d; oneNN = j }
          }
        }
        if (oneNN >= 0 && par(m) != -1) {
          val thisList = m :: chain(m)
          val thisIdx = thisList.zipWithIndex.toMap
          var c = oneNN
          val otherB = List.newBuilder[Int]
          while (!thisIdx.contains(c)) { otherB += c; c = par(c) }
          val lca = c
          val this2anc = thisList.take(thisIdx(lca)).filter(nd(_) < graftCap)
          val other2anc = otherB.result().filter(nd(_) < graftCap)
          if (this2anc.nonEmpty && other2anc.nonEmpty) {
            val curP = this2anc.map(a => getScore(par(a)))
            val nnP = other2anc.map(b => getScore(par(b)))
            var bestV = Double.NegativeInfinity
            var bR = 0; var bC = 0
            val masked = Array.ofDim[Boolean](this2anc.length, other2anc.length)
            for (r <- this2anc.indices; cc <- other2anc.indices) {
              val s = eScore(this2anc(r), other2anc(cc))
              val mk = s <= curP(r) || s <= nnP(cc)
              masked(r)(cc) = mk
              val v = if (mk) 0.0 else s
              if (v > bestV) { bestV = v; bR = r; bC = cc }
            }
            if (!masked(bR)(bC)) {
              grafts += 1
              val b1 = this2anc(bR); val b2 = other2anc(bC)
              val ndB2 = nd(b2); val ssB2 = ss(b2).clone()
              val newp = nxt; nxt += 1
              val sp = par(b2)
              val oldSib = ch(sp).find(_ != b2).get
              val sibGp = par(sp)
              par(oldSib) = sibGp
              if (sibGp != -1) ch(sibGp) = ch(sibGp).filter(_ != sp) :+ oldSib
              ch(sp) = Nil; par(sp) = -2
              val gp1 = par(b1)
              par(newp) = gp1
              if (gp1 != -1) ch(gp1) = ch(gp1).filter(_ != b1) :+ newp
              ch(newp) = List(b1, b2)
              par(b1) = newp; par(b2) = newp
              nd(newp) = nd(b1) + ndB2
              var k2 = 0
              while (k2 < dim) { ss(newp)(k2) = ss(b1)(k2) + ssB2(k2); k2 += 1 }
              // ±delta along the old and new chains up to, excluding, lca
              var cc2 = sibGp
              while (cc2 != -1 && cc2 != lca) {
                nd(cc2) -= ndB2
                var k3 = 0
                while (k3 < dim) { ss(cc2)(k3) -= ssB2(k3); k3 += 1 }
                cc2 = par(cc2)
              }
              cc2 = gp1
              while (cc2 != -1 && cc2 != lca) {
                nd(cc2) += ndB2
                var k3 = 0
                while (k3 < dim) { ss(cc2)(k3) += ssB2(k3); k3 += 1 }
                cc2 = par(cc2)
              }
            }
          }
        }
      }
    }
    (par.slice(0, nxt), grafts)
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

  private def runCase(seed: Int, n: Int, dim: Int, cap: Int, clustered: Boolean): Int = {
    val rnd = new Random(seed)
    val ptsL = if (clustered) clusteredPts(rnd, n, dim) else uniformPts(rnd, n, dim)
    val g = new Grinch(ptsL.map(_.map(_.toFloat)), rotateCap = 0, graftCap = cap,
      sim = "dot", norm = "none")
    g.buildDendrogram()
    val (par, grafts) = graftReplay(ptsL, cap)
    withClue(s"seed=$seed n=$n cap=$cap clustered=$clustered: ") {
      g.rawParents should contain theSameElementsInOrderAs par
      g.grafts shouldBe grafts
    }
    grafts
  }

  test("graft-enabled integer config equals the eager replay (h9 oracle model)") {
    var total = 0
    for (cap <- Seq(3, 6); seed <- 1 to 30) {
      total += runCase(seed, n = 60, dim = 8, cap = cap, clustered = false)
      total += runCase(seed, n = 60, dim = 8, cap = cap, clustered = true)
    }
    // the configs must actually graft, heavily, or the replay proves
    // little about `grinch_alg.py:308-387`
    total should be > 2000
  }

  test("h9-shaped case (n=200, cap=8, ±63 quantization) matches the replay") {
    val rnd = new Random(11)
    val pts = clusteredPts(rnd, 200, 8)
    val g = new Grinch(pts.map(_.map(_.toFloat)), rotateCap = 0, graftCap = 8,
      sim = "dot", norm = "none")
    g.buildDendrogram()
    val (par, grafts) = graftReplay(pts, 8)
    g.rawParents should contain theSameElementsInOrderAs par
    g.grafts shouldBe grafts
    grafts should be > 20
  }
}
