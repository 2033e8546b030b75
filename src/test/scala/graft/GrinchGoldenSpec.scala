package graft

import graft.operators.Grinch

/** Golden-equivalence test against the REFERENCE GRINCH implementation:
  * the expected assignments below were produced by running
  * /root/reference/meercat/grinch_alg.py (sim='dot', norm='l2') on the
  * same 24 float32 points (3 overlapping clusters, seeded noise) across
  * pruning configs and cut thresholds, then relabeling clusters by
  * first occurrence. Pins rotate/graft/prune/cut semantics end-to-end,
  * including the non-trivial theta=0.95 fragmentations that differ per
  * pruning strategy.
  *
  * Note: exact node-for-node TREE identity with the reference is not
  * asserted — the reference accumulates similarities in float32 (numpy
  * matmul) while this engine uses double accumulation, and a near-tie
  * graft decision can legitimately flip in the last float32 ulp; the
  * resulting flat clusterings still agree on every tested case.
  */
class GrinchGoldenSpec extends SparkSpec {

  private def pts: Array[Array[Float]] = GrinchGoldenFixture.pts

  private val cases: Seq[(String, Int, String, Double, Seq[Int])] = Seq(
    ("plain", -1, "least_recent", 0.3, Seq(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)),
    ("plain", -1, "least_recent", 0.6, Seq(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)),
    ("plain", -1, "least_recent", 0.8, Seq(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)),
    ("plain", -1, "least_recent", 0.95, Seq(0, 1, 2, 3, 4, 5, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 6, 7, 0, 8, 2, 0, 6, 2)),
    ("prune6", 6, "least_recent", 0.3, Seq(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)),
    ("prune6", 6, "least_recent", 0.6, Seq(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)),
    ("prune6", 6, "least_recent", 0.8, Seq(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)),
    ("prune6", 6, "least_recent", 0.95, Seq(0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 1, 2, 0, 1, 2, 0, 4, 2, 3, 5, 2, 3, 6, 7)),
    ("prunesim", 6, "similarity", 0.3, Seq(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)),
    ("prunesim", 6, "similarity", 0.6, Seq(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)),
    ("prunesim", 6, "similarity", 0.8, Seq(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)),
    ("prunesim", 6, "similarity", 0.95, Seq(0, 1, 2, 3, 4, 2, 3, 1, 2, 3, 4, 2, 0, 1, 2, 0, 5, 6, 3, 7, 2, 3, 5, 8)))

  private def canon(a: Array[Int]): Seq[Int] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    a.toSeq.map(c => seen.getOrElseUpdate(c, seen.size))
  }

  cases.foreach { case (label, limit, strategy, th, expected) =>
    test(s"reference-equivalent flat clustering: $label theta=$th") {
      val g = new Grinch(pts, activeLeafLimit = limit, pruningStrategy = strategy)
      g.buildDendrogram()
      canon(g.flatClustering(th)) shouldBe expected
    }
  }
}
