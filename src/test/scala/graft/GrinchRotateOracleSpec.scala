package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.util.Random

import graft.operators.Grinch

/** Pins the h7 oracle model: with rotateCap > 0, graftCap = 0,
  * sim="dot", norm="none" and no pruning, the GRINCH automaton
  * (`/root/reference/meercat/grinch_alg.py:166-257`) is replayable by a
  * sequential insert log that keeps, per node, only (parent, children,
  * descendant count, integer subtree sum, ancestor chain):
  *
  *  - nn_i = integer-dot argmax over prior leaves (lowest id on ties) —
  *    identical to the h5 restricted config, because with no pruning
  *    the active-leaf set is exactly the prior leaves, whose centroids
  *    are the unnormalized points themselves;
  *  - the rotate walk climbs nn_i's ancestor chain while
  *    score0 < score(parent) and numDescendants(parent) < rotateCap,
  *    where score0 = intdot(q_i, q_nn) is constant through the walk
  *    (the reference's `:252` quirk) and score(p) is the dot of p's
  *    children's centroids — each centroid being the float32-rounded
  *    `subtreeSum / numDescendants` (sums of int8 values stay exact in
  *    float32 below 2^24, so BIGINT sums replay them bit-for-bit);
  *  - the splice above the stop node is pure pointer surgery plus a
  *    +q_i/+1 update to every strict ancestor.
  *
  * Every arithmetic step is either exact integer or a deterministic
  * IEEE-754 (double-divide → float-round → double-dot) sequence, so the
  * same replay expressed as a DuckDB recursive CTE (the h7 oracle SQL in
  * [[QueriesGrinch]]) is bit-identical cross-engine. This spec proves
  * the replay model against the REAL automaton — including that the
  * configs under test actually rotate — so the SQL transcription is
  * checked transitively.
  *
  * Reference provenance: every runCase fixture is ALSO compared against
  * `src/test/resources/grinch_ref_parents.tsv`, parent relations
  * produced by executing `/root/reference/meercat/grinch_alg.py`
  * (scipy/tqdm stubbed) on the IDENTICAL vectors — the java-LCG
  * fixtures are regenerated bit-for-bit in Python by
  * `scripts/gen_grinch_goldens.py`. So engine == replay == reference,
  * all on the same data, for 28 rotate-enabled cases.
  */
class GrinchRotateOracleSpec extends AnyFunSuite with Matchers {

  /** case-key -> uid-indexed parent array (-1 = root), from executing
    * the reference on the same fixtures (scripts/gen_grinch_goldens.py)
    */
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

  /** The h7 replay. Returns (parent per uid, -1 for root; rotation
    * event count). Leaf uids are stream positions; internal uid for
    * insert i is n+i-1 (graft off ⇒ exactly one internal per insert,
    * no lazy deletions).
    */
  private[graft] def rotateReplay(q: Array[Array[Long]], cap: Int): (Array[Int], Int) = {
    val n = q.length
    val dim = q(0).length
    val total = 2 * n - 1
    val par = Array.fill(total)(-1)
    val c1 = Array.fill(total)(-1)
    val c2 = Array.fill(total)(-1)
    val nd = Array.fill(total)(0L)
    val sums = Array.ofDim[Long](total, dim)
    val anc = Array.fill(total)(List.empty[Int])
    nd(0) = 1
    Array.copy(q(0), 0, sums(0), 0, dim)
    var rotations = 0

    def idot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var k = 0
      while (k < dim) { s += a(k) * b(k); k += 1 }
      s
    }
    // the engine's centroid: (exact-integer float32 sum / double nd)
    // rounded back to float32 — replayed from the BIGINT subtree sums
    def cent(x: Int): Array[Float] =
      sums(x).map(s => (s.toDouble / nd(x).toDouble).toFloat)
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var k = 0
      while (k < dim) { s += a(k).toDouble * b(k).toDouble; k += 1 }
      s
    }
    def nscore(p: Int): Double = fdot(cent(c1(p)), cent(c2(p)))

    for (i <- 1 until n) {
      var nn = 0; var best = Long.MinValue
      for (j <- 0 until i) {
        val d = idot(q(i), q(j)); if (d > best) { best = d; nn = j }
      }
      val score0 = best.toDouble
      val chain = (nn :: anc(nn)).toArray
      var kstar = 0
      while (kstar + 1 < chain.length && score0 < nscore(chain(kstar + 1)) &&
        nd(chain(kstar + 1)) < cap) kstar += 1
      if (kstar > 0) rotations += 1
      val sib = chain(kstar)
      val ancAbove = chain.drop(kstar + 1).toList
      val m = n + i - 1
      val g = ancAbove.headOption.getOrElse(-1)
      // anc maintenance first (reads pre-splice chains): every strict
      // descendant of sib gets m inserted right after sib
      ((0 until i) ++ (n until m)).foreach { x =>
        val a = anc(x)
        val p = a.indexOf(sib)
        if (p >= 0) anc(x) = a.take(p + 1) ::: m :: a.drop(p + 1)
      }
      anc(i) = m :: ancAbove
      anc(m) = ancAbove
      anc(sib) = m :: ancAbove
      par(m) = g; par(sib) = m; par(i) = m
      c1(m) = sib; c2(m) = i
      if (g != -1) { if (c1(g) == sib) c1(g) = m else c2(g) = m }
      nd(i) = 1; nd(m) = nd(sib) + 1
      var k = 0
      while (k < dim) { sums(i)(k) = q(i)(k); sums(m)(k) = sums(sib)(k) + q(i)(k); k += 1 }
      ancAbove.foreach { x =>
        nd(x) += 1
        var k2 = 0
        while (k2 < dim) { sums(x)(k2) += q(i)(k2); k2 += 1 }
      }
    }
    (par, rotations)
  }

  private def runCase(seed: Int, n: Int, dim: Int, cap: Int, clustered: Boolean): Int = {
    val rnd = new Random(seed)
    val ptsL: Array[Array[Long]] =
      if (clustered) {
        val centers = Array.fill(4)(Array.fill(dim)((rnd.nextInt(255) - 127).toLong))
        Array.fill(n) {
          val c = centers(rnd.nextInt(centers.length))
          c.map(v => (v + rnd.nextInt(21) - 10).max(-127).min(127))
        }
      } else Array.fill(n)(Array.fill(dim)((rnd.nextInt(255) - 127).toLong))
    val pts = ptsL.map(_.map(_.toFloat))
    val g = new Grinch(pts, rotateCap = cap, graftCap = 0, sim = "dot", norm = "none")
    g.buildDendrogram()
    val got = g.treeNodes(_ => None)
      .map(t => t.uid.toInt -> t.parentUid.map(_.toInt).getOrElse(-1)).toMap
    val (par, rot) = rotateReplay(ptsL, cap)
    val refKey = s"h7_seed${seed}_n${n}_d${dim}_cap${cap}_" +
      (if (clustered) "clustered" else "uniform")
    val ref = refParents.getOrElse(refKey,
      fail(s"no reference-executed golden for $refKey — regenerate " +
        "src/test/resources/grinch_ref_parents.tsv (scripts/gen_grinch_goldens.py)"))
    withClue(s"seed=$seed n=$n cap=$cap clustered=$clustered: ") {
      got.size shouldBe 2 * n - 1
      (0 until 2 * n - 1).foreach { uid =>
        got(uid) shouldBe par(uid)
        got(uid) shouldBe ref(uid)
      }
      rot shouldBe g.rotations
    }
    rot
  }

  test("rotate-enabled integer config equals the anc-chain replay (h7 oracle model)") {
    var totalRot = 0
    for (seed <- 1 to 8) totalRot += runCase(seed, n = 80, dim = 8, cap = 12, clustered = false)
    for (seed <- 1 to 8) totalRot += runCase(seed, n = 80, dim = 8, cap = 16, clustered = true)
    // the configs must actually exercise the rotate path — a replay
    // that only ever stops at the 1-NN leaf would prove nothing
    totalRot should be > 0
  }

  test("rotate replay covers both walk terminations (score and cap)") {
    // tiny caps force the numDescendants guard to bind; huge caps leave
    // only the score comparison — both must stay engine-identical
    var rotSmall = 0; var rotHuge = 0
    for (seed <- 21 to 26) rotSmall += runCase(seed, n = 60, dim = 8, cap = 3, clustered = true)
    for (seed <- 21 to 26) rotHuge += runCase(seed, n = 60, dim = 8, cap = 1000000, clustered = true)
    rotHuge should be >= rotSmall
  }
}
