package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.util.Random

import graft.operators.Grinch

/** Property coverage for the GRAFT path (`grinch_alg.py:308-387`) — the
  * one GRINCH semantics with no DuckDB-expressible oracle. 120
  * randomized integer configs with graftCap > 0 (every one of which
  * performs at least one graft, asserted) are checked against the
  * reference implementation executed on the exact same vectors
  * (`src/test/resources/grinch_ref_parents.tsv`, java-LCG fixtures
  * reproduced bit-for-bit in Python by
  * `scripts/gen_grinch_goldens.py`):
  *
  *  1. LIVE-TREE STRUCTURE IDENTITY: the multiset of descendant-leaf
  *     sets over live nodes — i.e. the entire cluster hierarchy — is
  *     equal to the reference's in ALL 120 cases.
  *  2. Node-slot-level identity does NOT always hold, for a cause
  *     pinned by forensics and asserted directionally below: whenever
  *     graft's candidate pair is the LCA's own two children,
  *     `score_if_grafted` and the stored parent score are the SAME
  *     mathematical quantity — but the reference computes one via the
  *     batched `e_score_batch` (BLAS sgemm, float32) and the other via
  *     the scalar stored-score path, which can differ in the last
  *     float32 ULP (observed: 43752.336 vs 43752.332, one 0.0039 ULP
  *     at that magnitude). When the noise rounds the batch side up,
  *     the reference "grafts" two nodes that are already siblings:
  *     allocating a replacement parent, lazily deleting the old LCA,
  *     and leaving the leaf partition untouched. This engine computes
  *     both sides in double from the same centroids, gets exact
  *     equality, and correctly masks the pair (`s <= parentScore`), so
  *     it never performs these churn grafts — hence
  *     engineSlots <= referenceSlots always, live structure unchanged.
  *  3. Structural invariants that must survive rotate+graft surgery:
  *     one live root; every live internal node has exactly two live
  *     children; all n leaves stay live; stored num_descendants equals
  *     the recomputed subtree leaf count at every live node (the
  *     `updatedFromChildren` chains, `grinch_alg.py:472-479`);
  *     lazily-deleted (-2) slots are never the parent of a live node.
  */
class GrinchGraftPropertySpec extends AnyFunSuite with Matchers {

  private val refParents: Map[String, Array[Int]] = {
    val in = getClass.getResourceAsStream("/grinch_ref_parents.tsv")
    require(in != null, "grinch_ref_parents.tsv missing from test resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val Array(k, v) = line.split('\t')
      k -> v.split(',').map(_.toInt)
    }.toMap
    finally src.close()
  }

  private def uniformPts(rnd: Random, n: Int, dim: Int): Array[Array[Float]] =
    Array.fill(n)(Array.fill(dim)((rnd.nextInt(255) - 127).toFloat))

  private def clusteredPts(rnd: Random, n: Int, dim: Int): Array[Array[Float]] = {
    val centers = Array.fill(4)(Array.fill(dim)((rnd.nextInt(255) - 127).toLong))
    Array.fill(n) {
      val c = centers(rnd.nextInt(centers.length))
      c.map(v => (v + rnd.nextInt(21) - 10).max(-127).min(127).toFloat)
    }
  }

  /** Multiset of descendant-leaf sets over live nodes — the cluster
    * hierarchy, invariant under the reference's churn-graft renaming.
    */
  private def leafSets(p: Array[Int], n: Int): Map[Set[Int], Int] = {
    val sets = scala.collection.mutable.Map.empty[Int, Set[Int]].withDefaultValue(Set.empty)
    (0 until n).foreach { leaf =>
      var cur = leaf
      while (cur != -1) {
        require(cur != -2, s"live chain of leaf $leaf walked into a deleted slot")
        sets(cur) = sets(cur) + leaf
        cur = p(cur)
      }
    }
    sets.values.toSeq.groupBy(identity).map { case (s, xs) => s -> xs.size }
  }

  /** Runs one config; returns (grafts, rotations, idIdentical). */
  private def runCase(seed: Int, n: Int, dim: Int, rotateCap: Int, graftCap: Int,
                      clustered: Boolean): (Int, Int, Boolean) = {
    val rnd = new Random(seed)
    val pts = if (clustered) clusteredPts(rnd, n, dim) else uniformPts(rnd, n, dim)
    val g = new Grinch(pts, rotateCap = rotateCap, graftCap = graftCap,
      sim = "dot", norm = "none")
    g.buildDendrogram()
    val par = g.rawParents
    val nd = g.rawNumDescendants

    val key = s"gr_seed${seed}_n${n}_d${dim}_r${rotateCap}_g${graftCap}_" +
      (if (clustered) "clustered" else "uniform")
    val ref = refParents.getOrElse(key,
      fail(s"no reference-executed golden for $key — regenerate " +
        "src/test/resources/grinch_ref_parents.tsv (scripts/gen_grinch_goldens.py)"))

    withClue(s"$key: ") {
      // 1. the cluster hierarchy equals the reference's, same data
      leafSets(par, n) shouldBe leafSets(ref, n)
      // 2. the only slot-level divergence allowed is the reference's
      //    churn grafts — which always ALLOCATE MORE, never less
      par.length should be <= ref.length

      // 3. structural invariants
      val live = par.indices.filter(par(_) != -2)
      val liveSet = live.toSet
      live.count(par(_) == -1) shouldBe 1 // one root
      (0 until n).foreach(leaf => par(leaf) should not be -2) // leaves live
      live.filter(par(_) >= 0).foreach { x =>
        liveSet should contain(par(x)) // no live node hangs off a deleted slot
      }
      val childCount = live.filter(par(_) >= 0).groupBy(par(_)).map { case (p, cs) => p -> cs.size }
      val internals = live.filter(_ >= n)
      internals.foreach(p => childCount.getOrElse(p, 0) shouldBe 2) // binary
      // num_descendants conservation: recompute leaf counts bottom-up
      val recomputed = Array.fill(par.length)(0)
      (0 until n).foreach { leaf =>
        var cur = leaf
        while (cur != -1) { recomputed(cur) += 1; cur = par(cur) }
      }
      live.foreach(x => nd(x) shouldBe recomputed(x).toDouble)
    }
    (g.grafts, g.rotations, par.length == ref.length && par.sameElements(ref))
  }

  test("120 graft-enabled integer configs: cluster-hierarchy identity with the reference + invariants") {
    var grafts = 0; var rotations = 0; var idIdentical = 0
    for (seed <- 1 to 60) {
      val (gr, ro, idi) = runCase(seed, n = 40, dim = 8, rotateCap = 8, graftCap = 8, clustered = true)
      gr should be > 0 // every case grafts (checked at golden-generation time too)
      grafts += gr; rotations += ro; if (idi) idIdentical += 1
    }
    for (seed <- 1 to 60) {
      val (gr, ro, idi) = runCase(seed, n = 40, dim = 8, rotateCap = 12, graftCap = 16, clustered = false)
      gr should be > 0
      grafts += gr; rotations += ro; if (idi) idIdentical += 1
    }
    // the property set must exercise both mutation paths heavily
    grafts should be > 120
    rotations should be > 0
    // some cases avoid the churn edge entirely and match slot-for-slot
    idIdentical should be > 0
  }
}
