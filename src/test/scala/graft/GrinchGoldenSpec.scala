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
  */
class GrinchGoldenSpec extends SparkSpec {

  private val pts: Array[Array[Float]] = Array(
    Array(0.9403859972953796f, 0.2619534730911255f, -0.057637836784124374f, 0.20912306010723114f),
    Array(0.29851603507995605f, 0.9162190556526184f, 0.0006997566670179367f, -0.2672644257545471f),
    Array(-0.14012391865253448f, -7.110196747817099e-05f, 0.9729247093200684f, 0.1838008165359497f),
    Array(0.9002513289451599f, -0.2984060049057007f, -0.1456436663866043f, 0.2815834879875183f),
    Array(-0.18500405550003052f, 0.8912113904953003f, 0.27833491563796997f, -0.30666810274124146f),
    Array(0.08055347204208374f, 0.36061546206474304f, 0.9284172058105469f, 0.03884707763791084f),
    Array(0.971939206123352f, -0.19401265680789948f, 0.012382655404508114f, 0.1324390172958374f),
    Array(0.11760060489177704f, 0.9715722799301147f, -0.20536808669567108f, -0.006425159517675638f),
    Array(-0.09494450688362122f, -0.016813313588500023f, 0.9630665183067322f, 0.25140759348869324f),
    Array(0.9847304224967957f, -0.10792072862386703f, 0.04213738813996315f, -0.12993687391281128f),
    Array(-0.03631576523184776f, 0.9869244694709778f, 0.12121369689702988f, -0.09984292834997177f),
    Array(-0.02881956659257412f, 0.15451690554618835f, 0.9451500177383423f, 0.28633084893226624f),
    Array(0.9728626608848572f, 0.21151550114154816f, -0.06809542328119278f, -0.06451676040887833f),
    Array(0.08709336817264557f, 0.940721869468689f, -0.05516352131962776f, -0.323131799697876f),
    Array(-0.26544031500816345f, 0.13631734251976013f, 0.9458600878715515f, 0.12770195305347443f),
    Array(0.9640476107597351f, 0.09359551221132278f, -0.22866035997867584f, -0.09780850261449814f),
    Array(0.06946084648370743f, 0.872955322265625f, 0.34880271553993225f, 0.3338574469089508f),
    Array(0.1891891360282898f, -0.015028662979602814f, 0.9611740708351135f, -0.20031481981277466f),
    Array(0.9809432029724121f, -0.02933669276535511f, 0.19173799455165863f, -0.011237847618758678f),
    Array(-0.2691079378128052f, 0.9427481293678284f, -0.13011622428894043f, -0.1479078084230423f),
    Array(-0.2313784956932068f, -0.05886392295360565f, 0.9522818326950073f, 0.1901533603668213f),
    Array(0.9869101643562317f, 0.012810162268579006f, -0.0225247610360384f, 0.1591755598783493f),
    Array(0.22344206273555756f, 0.9251157641410828f, 0.1733580380678177f, 0.25334039330482483f),
    Array(-0.3418944478034973f, 0.27961620688438416f, 0.8969935774803162f, -0.01803872361779213f))

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
