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
