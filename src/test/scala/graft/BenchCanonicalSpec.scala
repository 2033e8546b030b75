package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins [[Bench.parseCanonical]] against the COMMITTED canonical file:
  * the outlier-defense retry pass reads it at every bench run, and a
  * format drift that parses zero entries silently disarms the pass
  * (exactly what the round-12 pretty-printing of bench_queries.json
  * did — r13's v7 median ran 3.6× over canonical with no retry).
  * Whoever reformats the file now breaks this spec, not the bench.
  */
class BenchCanonicalSpec extends AnyFunSuite with Matchers {

  test("committed bench_queries.json parses to a full per-query map") {
    val s = java.nio.file.Files.readString(
      java.nio.file.Paths.get("bench_queries.json"))
    val m = Bench.parseCanonical(s)
    withClue(s"parsed ${m.size} entries: ") { m.size should be >= 100 }
    // every benchable catalog entry has a canonical reference — a new
    // query without one silently escapes the retry pass
    val missing = SparkEntry.queries.keySet -- m.keySet
    withClue(s"queries missing from canonical: $missing — add their " +
      "medians from the latest clean run: ") { missing shouldBe empty }
    all(m.values) should be > 0.0
  }

  test("committed canonical was measured quiet (ambient-cores ceiling under the bound)") {
    // VERDICT r18 #3: a canonical re-baselined under concurrent machine
    // load (r18 carried 1.21x inflation on 154 unchanged queries)
    // corrupts the retry rule and every future regression compare. The
    // gate is the per-family AMBIENT map — other processes' measured
    // CPU cores over each family's window — NOT raw loadavg, which the
    // bench's own 32-thread Spark work inflates past any honest bound
    // (the genuinely-quiet r17 canonical recorded a 7.11 loadavg
    // ceiling). scripts/adopt_canonical.sh enforces the same bound at
    // adoption time; this spec keeps a hand-copied map from sneaking
    // past it.
    val s = java.nio.file.Files.readString(
      java.nio.file.Paths.get("bench_queries.json"))
    val ceil = Bench.parseMapCeiling(s, "ambient")
    withClue(s"recorded ambient-cores ceiling $ceil vs bound " +
      s"${Bench.CanonicalAmbientBound} — re-measure on a quiet box and " +
      "adopt via scripts/adopt_canonical.sh: ") {
      ceil should be >= 0.0
      ceil should be <= Bench.CanonicalAmbientBound
    }
  }

  test("committed canonical was measured quiet on the IO/memory axes too (iowait + PSI ceilings)") {
    // VERDICT r19 #4: the busy-jiffies ambient EXCLUDES iowait, so the
    // r19 driver run's IO/page-cache contention (1.55x median
    // inflation, d family 2.9x) scored ambient ~ 0 and sailed through
    // the old gate. The canonical line now records per-family iowait
    // cores and PSI some-stall fractions; this spec pins the committed
    // file against the same bounds scripts/adopt_canonical.sh enforces
    // at adoption (psi_cpu recorded but unbounded — the bench's own 32
    // threads stall each other by design).
    val s = java.nio.file.Files.readString(
      java.nio.file.Paths.get("bench_queries.json"))
    val iow = Bench.parseMapCeiling(s, "iowait")
    withClue(s"recorded iowait-cores ceiling $iow vs bound " +
      s"${Bench.CanonicalIowaitBound}: ") {
      iow should be >= 0.0
      iow should be <= Bench.CanonicalIowaitBound
    }
    val pio = Bench.parseMapCeiling(s, "psi_io")
    withClue(s"recorded psi_io some-stall ceiling $pio vs bound " +
      s"${Bench.CanonicalPsiIoBound}: ") {
      pio should be >= 0.0
      pio should be <= Bench.CanonicalPsiIoBound
    }
    val pmem = Bench.parseMapCeiling(s, "psi_mem")
    withClue(s"recorded psi_mem some-stall ceiling $pmem vs bound " +
      s"${Bench.CanonicalPsiMemBound}: ") {
      pmem should be >= 0.0
      pmem should be <= Bench.CanonicalPsiMemBound
    }
  }

  test("cpuJiffiesIo / psiTotals read monotone non-negative counters on this platform") {
    val (b0, s0, io0) = Bench.cpuJiffiesIo()
    b0 should be > 0L
    s0 should be >= 0L
    io0 should be >= 0L
    val (c0, i0, m0) = Bench.psiTotals()
    // PSI may legitimately be absent (-1 disables the gate explicitly);
    // on this platform it exists, so pin the real read path
    c0 should be >= 0L
    i0 should be >= 0L
    m0 should be >= 0L
    val (b1, s1, io1) = Bench.cpuJiffiesIo()
    b1 should be >= b0
    io1 should be >= io0
    val (c1, i1, m1) = Bench.psiTotals()
    c1 should be >= c0
    i1 should be >= i0
    m1 should be >= m0
    s1 should be >= s0
  }

  test("map-ceiling parser reads flat and array-valued sample maps") {
    val line = """{"metric":"total","queries":{"a":1.0},""" +
      """"loadavg":{"a":[0.52,1.10],"st":[2.90,0.75]},""" +
      """"ambient":{"a":0.03,"st":0.41},"value":1.0}"""
    Bench.parseMapCeiling(line, "loadavg") shouldBe 2.90
    Bench.parseMapCeiling(line, "ambient") shouldBe 0.41
    Bench.parseMapCeiling("""{"queries":{"a":1.0}}""", "ambient") shouldBe -1.0
  }

  test("adc build/serve split: adoption requires adc_build_cold; committed value sane when present") {
    // Round 21 (VERDICT r20 #2): the v16/v16b medians are warm serving
    // walls (memoized index); the bench emits the one-time build as its
    // own adc_build_cold column. A future canonical must carry it —
    // adopt_canonical.sh refuses otherwise — and when the committed
    // file already does, the value must be a plausible positive wall.
    val script = java.nio.file.Files.readString(
      java.nio.file.Paths.get("scripts/adopt_canonical.sh"))
    withClue("adopt_canonical.sh must refuse a canonical without the " +
      "build/serve split: ") {
      script should include("adc_build_cold")
    }
    val s = java.nio.file.Files.readString(
      java.nio.file.Paths.get("bench_queries.json"))
    """"adc_build_cold"\s*:\s*(-?[0-9.]+)""".r.findFirstMatchIn(s).foreach { m =>
      withClue(s"committed adc_build_cold = ${m.group(1)}: ") {
        m.group(1).toDouble should be > 0.0
      }
    }
  }

  test("cpuJiffies reads monotone non-negative counters on this platform") {
    val (b0, s0) = Bench.cpuJiffies()
    b0 should be > 0L
    s0 should be >= 0L
    val deadline = System.nanoTime() + 200000000L
    while (System.nanoTime() < deadline) {} // burn a little self CPU
    val (b1, s1) = Bench.cpuJiffies()
    b1 should be >= b0
    s1 should be >= s0
  }

  test("parser tolerates both compact and pretty-printed layouts") {
    val compact = """{"metric":"total","queries":{"a_b":0.25,"c9_x":1.5},"mins":{"a_b":0.2}}"""
    val pretty =
      """{
        | "metric": "total",
        | "queries": {
        |  "a_b": 0.25,
        |  "c9_x": 1.5
        | },
        | "mins": {
        |  "a_b": 0.2
        | }
        |}""".stripMargin
    val expect = Map("a_b" -> 0.25, "c9_x" -> 1.5)
    Bench.parseCanonical(compact) shouldBe expect
    Bench.parseCanonical(pretty) shouldBe expect
    Bench.parseCanonical("not json at all") shouldBe Map.empty
  }
}
