package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.util.Random

import graft.operators.Grinch

/** Pins the h8 oracle model: with rotateCap = 0, graftCap = 0,
  * pruningStrategy = "least_recent", sim = "dot", norm = "none" and a
  * finite activeLeafLimit, the GRINCH automaton
  * (`/root/reference/meercat/grinch_alg.py:166-202` + prune `:389-413`)
  * is replayable by an ALL-INTEGER state machine — per node only
  * (parent, children, active flag, first_used, integer subtree sum):
  *
  *  - cknn: an active leaf is a real point (centroid = its vector) or
  *    a pruned node, whose centroid the reference's lazy maintenance
  *    always resolves to subtreeSum/2 — the prune-time single_update
  *    (`:398-399`) divides by numDescendants = 1+1 because both
  *    children are active leaves with forced count 1 (`:403`), and any
  *    earlier flag-clear already saw the same two final children (a
  *    child becoming active, or any splice below, re-flags the node via
  *    the `updated_from_children` chains, forcing a fresh prune-time
  *    update). Comparing 2·dot(q_i, centroid) therefore keeps the
  *    argmax in exact integers; below the float32 exactness bound
  *    (|dot| < 2^23, all terms multiples of 0.5) the reference's f32
  *    sims are the same numbers bit-for-bit, ties to the lowest id
  *    (np.argmax first-max = the engine's ascending TreeSet scan);
  *  - least_recent selection (`:134-139`): integer argmin over
  *    first_used of internal nodes with two active-leaf children
  *    (np.unique ascending ⇒ first-min = lowest id on ties);
  *  - decisions never read num_descendants (the rotate guard is dead at
  *    cap 0, graft's candidate filters empty at cap 0) or any float
  *    state, so the lazy update machinery cannot leak into the replay.
  *
  * The same replay expressed as a DuckDB recursive CTE is the h8 oracle
  * SQL in [[QueriesGrinch]]; this spec proves the model against the
  * REAL automaton — including that every config actually prunes — and
  * against the reference implementation executed on the exact same
  * java-LCG vectors (`src/test/resources/grinch_ref_parents.tsv`,
  * regenerated bit-for-bit by `scripts/gen_grinch_goldens.py`), parent
  * slots AND final active-leaf masks both. So engine == replay ==
  * reference, all on the same data, for 60 prune-enabled cases.
  */
class GrinchPruneOracleSpec extends AnyFunSuite with Matchers {

  /** case-key -> uid-indexed int array from executing the reference on
    * the same fixtures; `pr_*` keys carry parents, `pr_*_act` keys the
    * matching 0/1 active-leaf masks.
    */
  private val refGold: Map[String, Array[Int]] = {
    val in = getClass.getResourceAsStream("/grinch_ref_parents.tsv")
    require(in != null, "grinch_ref_parents.tsv missing from test resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val Array(k, v) = line.split('\t')
      k -> v.split(',').map(_.toInt)
    }.toMap
    finally src.close()
  }

  /** The h8 replay. Returns (parent per uid, active mask, prune count).
    * Leaf uids are stream positions; internal uid for insert i is
    * n+i-1 (no graft ⇒ exactly one internal per insert).
    */
  private[graft] def pruneReplay(q: Array[Array[Long]], limit: Int)
    : (Array[Int], Array[Boolean], Int) = {
    val n = q.length
    val dim = q(0).length
    val total = 2 * n - 1
    val par = Array.fill(total)(-1)
    val c1 = Array.fill(total)(-1)
    val c2 = Array.fill(total)(-1)
    val act = Array.fill(total)(false)
    val fu = Array.fill(total)(0)
    val ss = Array.ofDim[Long](total, dim)
    Array.copy(q(0), 0, ss(0), 0, dim)
    act(0) = true
    var na = 1
    var prunes = 0

    def idot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var k = 0
      while (k < dim) { s += a(k) * b(k); k += 1 }
      s
    }

    for (i <- 1 until n) {
      // sib = argmax over active leaves of dot(q_i, centroid), compared
      // as exact 2·dot integers (real leaf: 2·idot(q_i, q_x); pruned
      // node: centroid = ss/2 ⇒ 2·dot = idot(q_i, ss)); lowest id ties
      var sib = -1; var best = Long.MinValue
      var x = 0
      while (x < total) {
        if (act(x)) {
          val v = if (x < n) 2L * idot(q(i), q(x)) else idot(q(i), ss(x))
          if (v > best) { best = v; sib = x }
        }
        x += 1
      }
      val m = n + i - 1
      val g = par(sib)
      par(m) = g; par(sib) = m; par(i) = m
      c1(m) = sib; c2(m) = i
      if (g != -1) { if (c1(g) == sib) c1(g) = m else c2(g) = m }
      act(i) = true
      fu(i) = i; fu(m) = i
      Array.copy(q(i), 0, ss(i), 0, dim)
      na += 1
      if (na > limit) {
        // candidates: internal nodes with both children active leaves,
        // ascending id; least_recent = first min first_used
        var pruned = -1; var bestFu = Int.MaxValue
        var p = n
        while (p < total) {
          if (c1(p) >= 0 && act(c1(p)) && act(c2(p)) && fu(p) < bestFu) {
            bestFu = fu(p); pruned = p
          }
          p += 1
        }
        require(pruned >= 0, "no prune candidate — impossible on a live binary tree")
        prunes += 1
        var k = 0
        while (k < dim) { ss(pruned)(k) = ss(c1(pruned))(k) + ss(c2(pruned))(k); k += 1 }
        act(pruned) = true
        act(c1(pruned)) = false
        act(c2(pruned)) = false
        na -= 1
      }
    }
    (par, act, prunes)
  }

  private def uniformPts(rnd: Random, n: Int, dim: Int): Array[Array[Long]] =
    Array.fill(n)(Array.fill(dim)((rnd.nextInt(255) - 127).toLong))

  private def clusteredPts(rnd: Random, n: Int, dim: Int): Array[Array[Long]] = {
    val centers = Array.fill(4)(Array.fill(dim)((rnd.nextInt(255) - 127).toLong))
    Array.fill(n) {
      val c = centers(rnd.nextInt(centers.length))
      c.map(v => (v + rnd.nextInt(21) - 10).max(-127).min(127))
    }
  }

  private def runCase(seed: Int, n: Int, dim: Int, limit: Int, clustered: Boolean): Int = {
    val rnd = new Random(seed)
    val ptsL = if (clustered) clusteredPts(rnd, n, dim) else uniformPts(rnd, n, dim)
    val g = new Grinch(ptsL.map(_.map(_.toFloat)), rotateCap = 0, graftCap = 0,
      sim = "dot", norm = "none", activeLeafLimit = limit,
      pruningStrategy = "least_recent")
    g.buildDendrogram()
    val (par, actR, prunes) = pruneReplay(ptsL, limit)
    val gotPar = g.rawParents
    val gotAct = g.rawActiveLeaves
    val refKey = s"pr_seed${seed}_n${n}_d${dim}_L${limit}_" +
      (if (clustered) "clustered" else "uniform")
    val refPar = refGold.getOrElse(refKey,
      fail(s"no reference-executed golden for $refKey — regenerate " +
        "src/test/resources/grinch_ref_parents.tsv (scripts/gen_grinch_goldens.py)"))
    val refAct = refGold.getOrElse(refKey + "_act",
      fail(s"no reference-executed active mask for $refKey"))
    withClue(s"seed=$seed n=$n L=$limit clustered=$clustered: ") {
      gotPar.length shouldBe 2 * n - 1
      (0 until 2 * n - 1).foreach { uid =>
        gotPar(uid) shouldBe par(uid)
        gotPar(uid) shouldBe refPar(uid)
        gotAct(uid) shouldBe actR(uid)
        gotAct(uid) shouldBe (refAct(uid) == 1)
      }
      g.prunes shouldBe prunes
    }
    prunes
  }

  test("prune-enabled integer config equals the all-integer replay and the reference") {
    var totalPrunes = 0
    for (seed <- 1 to 30) totalPrunes += runCase(seed, n = 60, dim = 8, limit = 12, clustered = false)
    for (seed <- 1 to 30) totalPrunes += runCase(seed, n = 60, dim = 8, limit = 12, clustered = true)
    // every case must actually exercise the memory bound; with n=60 and
    // limit=12 each run prunes ~47 times — assert the family total
    totalPrunes should be > 60 * 40
  }

  /** Engine vs reference-executed golden, slot-for-slot (parents and
    * active mask), for configs with no integer replay — score-based
    * prune strategies and the rotate+prune interaction.
    */
  private def runRefOnly(key: String, pts: Array[Array[Long]], rotateCap: Int,
                         limit: Int, strategy: String,
                         threshold: Double = Double.NaN): Unit = {
    val g = new Grinch(pts.map(_.map(_.toFloat)), rotateCap = rotateCap,
      graftCap = 0, sim = "dot", norm = "none", activeLeafLimit = limit,
      pruningStrategy = strategy, pruningThreshold = threshold)
    g.buildDendrogram()
    val refPar = refGold.getOrElse(key, fail(s"no golden for $key"))
    val refAct = refGold.getOrElse(key + "_act", fail(s"no active mask for $key"))
    withClue(s"$key: ") {
      g.prunes should be > 0
      g.rawParents should contain theSameElementsInOrderAs refPar
      g.rawActiveLeaves.map(a => if (a) 1 else 0) should
        contain theSameElementsInOrderAs refAct
    }
  }

  test("similarity-strategy prune matches the reference slot-for-slot") {
    for (seed <- 1 to 20) {
      val rnd = new Random(seed)
      runRefOnly(s"psim_seed${seed}_n60_d8_L12_uniform",
        uniformPts(rnd, 60, 8), rotateCap = 0, limit = 12, strategy = "similarity")
      val rnd2 = new Random(seed)
      runRefOnly(s"psim_seed${seed}_n60_d8_L12_clustered",
        clusteredPts(rnd2, 60, 8), rotateCap = 0, limit = 12, strategy = "similarity")
    }
  }

  test("combined-strategy prune matches the reference slot-for-slot") {
    for (seed <- 1 to 20) {
      runRefOnly(s"pcmb_seed${seed}_n60_d8_L12_t15000_clustered",
        clusteredPts(new Random(seed), 60, 8), rotateCap = 0, limit = 12,
        strategy = "combined", threshold = 15000.0)
      runRefOnly(s"pcmb_seed${seed}_n60_d8_L12_t0_uniform",
        uniformPts(new Random(seed), 60, 8), rotateCap = 0, limit = 12,
        strategy = "combined", threshold = 0.0)
    }
  }

  test("rotate+prune interaction matches the reference slot-for-slot") {
    for (seed <- 1 to 20) {
      runRefOnly(s"prot_seed${seed}_n60_d8_r12_L12_clustered",
        clusteredPts(new Random(seed), 60, 8), rotateCap = 12, limit = 12,
        strategy = "least_recent")
      runRefOnly(s"prot_seed${seed}_n60_d8_r12_L12_uniform",
        uniformPts(new Random(seed), 60, 8), rotateCap = 12, limit = 12,
        strategy = "least_recent")
    }
  }

  /** Multiset of descendant-leaf sets over live nodes (leaf-to-root
    * chains) — hierarchy identity robust to the reference's churn-graft
    * slot renaming (see GrinchGraftPropertySpec point 2).
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
    sets.values.groupBy(identity).map { case (k, v) => k -> v.size }
  }

  test("full automaton (rotate+graft+prune) matches the reference's live hierarchy and active frontier") {
    for (seed <- 1 to 20) {
      val pts = clusteredPts(new Random(seed), 60, 8)
      val g = new Grinch(pts.map(_.map(_.toFloat)), rotateCap = 8, graftCap = 8,
        sim = "dot", norm = "none", activeLeafLimit = 12,
        pruningStrategy = "least_recent")
      g.buildDendrogram()
      val key = s"pfull_seed${seed}_n60_d8_r8_g8_L12_clustered"
      val refPar = refGold.getOrElse(key, fail(s"no golden for $key"))
      val refAct = refGold.getOrElse(key + "_act", fail(s"no active mask for $key"))
      val gotPar = g.rawParents
      val gotAct = g.rawActiveLeaves
      withClue(s"$key: ") {
        g.prunes should be > 0
        // hierarchy identity (slot ids may diverge on ULP churn grafts;
        // the engine never allocates more slots than the reference)
        gotPar.length should be <= refPar.length
        leafSets(gotPar, 60) shouldBe leafSets(refPar, 60)
        // active frontier identity as descendant-leaf sets
        val gotSets = leafSetsByUid(gotPar, 60)
        val refSets = leafSetsByUid(refPar, 60)
        val gotActive = gotAct.zipWithIndex.collect { case (true, u) => gotSets(u) }
        val refActive = refAct.zipWithIndex.collect { case (1, u) => refSets(u) }
        gotActive.groupBy(identity).map { case (k, v) => k -> v.length } shouldBe
          refActive.groupBy(identity).map { case (k, v) => k -> v.length }
      }
    }
  }

  private def leafSetsByUid(p: Array[Int], n: Int): Map[Int, Set[Int]] = {
    val sets = scala.collection.mutable.Map.empty[Int, Set[Int]].withDefaultValue(Set.empty)
    (0 until n).foreach { leaf =>
      var cur = leaf
      while (cur != -1 && cur != -2) {
        sets(cur) = sets(cur) + leaf
        cur = p(cur)
      }
    }
    sets.toMap
  }

  test("h8-shaped case (n=200, L=24, ±63 quantization) matches the replay") {
    // the exact shape the h8 driver query runs (engine vs replay; the
    // ±63 magnitude keeps 2·dot far below the f32 exactness bound even
    // with 200-point subtree sums — same argument as the oracle SQL)
    val rnd = new Random(8)
    val pts = Array.fill(200)(Array.fill(8)((rnd.nextInt(127) - 63).toLong))
    val g = new Grinch(pts.map(_.map(_.toFloat)), rotateCap = 0, graftCap = 0,
      sim = "dot", norm = "none", activeLeafLimit = 24,
      pruningStrategy = "least_recent")
    g.buildDendrogram()
    val (par, actR, prunes) = pruneReplay(pts, 24)
    g.rawParents should contain theSameElementsInOrderAs par
    g.rawActiveLeaves should contain theSameElementsInOrderAs actR
    g.prunes shouldBe prunes
    prunes should be > 100
  }
}
