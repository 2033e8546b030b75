package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Ordered-funnel operator (w4): per-user earliest step-prefix
  * completions with a strictly-after dependency between steps.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  private def run(rows: Seq[(Long, Long, String)]) =
    Relational.funnelStages(rows.toDF("u", "ts", "et"), "u", "ts", "et", steps)
      .select("u", "t_a_us", "t_b_us", "t_c_us", "stage")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("funnelStages: full completion, order matters, earliest qualifying times picked") {
    val out = run(Seq(
      // user 1: b before any a must NOT count; the post-a b does
      (1L, 10L, "b"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "c"),
      // user 2: completes out of order — c arrives before b → stage 2
      (2L, 10L, "a"), (2L, 20L, "c"), (2L, 30L, "b"),
      // user 3: never starts — only later steps
      (3L, 10L, "b"), (3L, 20L, "c"),
      // user 4: repeats — earliest qualifying chain wins
      (4L, 10L, "a"), (4L, 15L, "a"), (4L, 20L, "b"), (4L, 25L, "b"), (4L, 30L, "c")))
    out(1L) shouldBe ((Some(20L), Some(30L), Some(40L), 3L))
    out(2L) shouldBe ((Some(10L), Some(30L), None, 2L))
    out(3L) shouldBe ((None, None, None, 0L))
    out(4L) shouldBe ((Some(10L), Some(20L), Some(30L), 3L))
  }

  test("funnelStages: simultaneous events never qualify on each other (strictly-after)") {
    val out = run(Seq(
      // a and b at the SAME timestamp: b is not after a → not counted;
      // the later b is
      (1L, 10L, "a"), (1L, 10L, "b"), (1L, 20L, "b"),
      // user 2: the whole chain collapses onto one instant → only a
      (2L, 10L, "a"), (2L, 10L, "b"), (2L, 10L, "c")))
    out(1L) shouldBe ((Some(10L), Some(20L), None, 2L))
    out(2L) shouldBe ((Some(10L), None, None, 1L))
  }

  test("seeded random parity with the closed-form funnel definition") {
    // closed form: t_0 = min step-0 ts; t_i = min { step-i ts : ts > t_{i-1} }
    // — equivalent to the running strictly-earlier frame because t_{i-1}
    // is the global minimum qualifying time
    def local(rows: Seq[(Long, Long, String)]): Map[Long, Seq[Option[Long]]] =
      rows.groupBy(_._1).map { case (u, es) =>
        val byStep = steps.map(st => es.filter(_._3 == st).map(_._2))
        val ts = byStep.foldLeft(Seq.empty[Option[Long]]) { (acc, cand) =>
          val prev = acc.lastOption.getOrElse(Some(Long.MinValue))
          acc :+ prev.flatMap(p => cand.filter(_ > p).minOption)
        }
        u -> ts
      }
    for (seed <- Seq(3, 99, 2026)) {
      val rnd = new scala.util.Random(seed)
      val types = Seq("a", "b", "c", "x", "y") // includes non-step noise
      // few users × coarse ts: dense same-ts collisions across steps
      val rows = (0 until 400).map { _ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, types(rnd.nextInt(types.length)))
      }
      val got = run(rows).map { case (u, (a, b, c, _)) => u -> Seq(a, b, c) }
      withClue(s"seed=$seed: ") { got shouldBe local(rows) }
    }
  }

  test("funnelStages: one user-key exchange carries all steps (no per-step shuffles)") {
    val df = Relational.funnelStages(
      Seq((1L, 10L, "a")).toDF("u", "ts", "et"), "u", "ts", "et", steps)
    val plan = df.queryExecution.executedPlan.toString
    // chained step windows + the final aggregate all share the user
    // partitioning: exactly one hashpartitioning exchange in the plan
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }
}
