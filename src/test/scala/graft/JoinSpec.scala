package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class JoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest at-or-before row per key, null when none precedes") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 5L), (3L, 20L, 50L))
      .toDF("lid", "k", "lt") // (left id, key, left time)
    val right = Seq((10L, 40L, 7L), (10L, 90L, 9L), (20L, 60L, 8L))
      .toDF("k", "rt", "payload")
    val out = Relational.asofJoin(left, right, "k",
      col("lt"), col("rt"), tie = col("payload"), payload = Seq("payload"))
      .select("lid", "asof_payload").as[(Long, Option[Long])].collect().toMap
    out(1L) shouldBe Some(9L) // both right rows precede t=100 → latest (rt=90)
    out(2L) shouldBe None     // nothing at-or-before t=5
    out(3L) shouldBe None     // key 20's row is at t=60 > 50
  }

  test("asofJoin: at-or-before includes equal time; ties pick max tie value") {
    val left = Seq((1L, 10L, 50L)).toDF("lid", "k", "lt")
    val right = Seq((10L, 50L, 3L), (10L, 50L, 7L), (10L, 40L, 1L))
      .toDF("k", "rt", "payload")
    val out = Relational.asofJoin(left, right, "k",
      col("lt"), col("rt"), tie = col("payload"), payload = Seq("payload"))
      .select("lid", "asof_payload").as[(Long, Long)].collect().toMap
    // rt=50 rows are eligible (at-or-before), and among the two
    // simultaneous rows the larger tie value wins deterministically
    out(1L) shouldBe 7L
  }

  test("asofJoin: multiple payload columns come from the same picked row") {
    val left = Seq((1L, 10L, 100L)).toDF("lid", "k", "lt")
    val right = Seq((10L, 40L, 7L, "a"), (10L, 90L, 9L, "b"))
      .toDF("k", "rt", "pk", "tag")
    val out = Relational.asofJoin(left, right, "k",
      col("lt"), col("rt"), tie = col("pk"), payload = Seq("pk", "tag"))
      .select("asof_pk", "asof_tag").as[(Long, String)].collect().head
    out shouldBe ((9L, "b"))
  }

  test("asofJoin: a NULL field in the picked row stays NULL (no mixing of right rows)") {
    // the LATEST right row (rt=90) has tag=NULL; a per-column window
    // would silently backfill tag from the older rt=40 row while pk
    // came from rt=90 — the struct carry keeps both from the same row
    val left = Seq((1L, 10L, 100L)).toDF("lid", "k", "lt")
    val right = Seq((10L, 40L, 7L, Some("a")), (10L, 90L, 9L, None: Option[String]))
      .toDF("k", "rt", "pk", "tag")
    val out = Relational.asofJoin(left, right, "k",
      col("lt"), col("rt"), tie = col("pk"), payload = Seq("pk", "tag"))
      .select("asof_pk", "asof_tag").as[(Long, Option[String])].collect().head
    out shouldBe ((9L, None))
  }

  private val probe = Seq(
    (1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L), (5L, 399L),
    (6L, 400L), (7L, 1000L), (8L, 1234L))
    .toDF("pid", "pts")
  private val ivals = Seq(
    (10L, 100L, 400L),  // spans buckets 1-3 at width 100
    (20L, 0L, 100L),    // exactly one bucket
    (30L, 950L, 1300L), // crosses bucket boundary mid-interval
    (40L, 500L, 500L),  // empty — matches nothing
    (50L, 700L, 600L))  // inverted — matches nothing
    .toDF("iid", "istart", "iend")

  private def naive = probe.crossJoin(ivals)
    .where(col("pts") >= col("istart") && col("pts") < col("iend"))
    .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("rangeJoinBucketed matches the naive range join, [start, end) boundaries") {
    val out = Relational.rangeJoinBucketed(probe, ivals, "pts", "istart", "iend", 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    out shouldBe naive
    // boundary semantics pinned explicitly: start inclusive, end exclusive
    out should contain((3L, 10L))   // pts == istart
    out should not contain ((6L, 10L)) // pts == iend
    out should contain((7L, 30L))   // probe bucket != interval start bucket
  }

  test("rangeJoinBucketed matches naive at other bucket widths (intervals span many buckets)") {
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val out = Relational.rangeJoinBucketed(probe, ivals, "pts", "istart", "iend", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      withClue(s"bucketWidth=$w: ") { out shouldBe naive }
    }
  }

  test("rangeCountSumPrefix equals rangeJoinBucketed + groupBy (incl. boundary ties)") {
    val p = probe.withColumn("pv", col("pid") * 10L)
    def viaPairs(w: Long) = Relational
      .rangeJoinBucketed(p, ivals, "pts", "istart", "iend", w)
      .groupBy("iid").agg(count(lit(1)).as("cnt"), sum(col("pv")).as("sum"))
      .select("iid", "cnt", "sum").as[(Long, Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 100L, 1000L)) {
      val out = Relational.rangeCountSumPrefix(p, ivals, "pts", "pv", "iid",
          "istart", "iend", w)
        .select("iid", "cnt", "sum").as[(Long, Long, Long)].collect().toSet
      withClue(s"bucketWidth=$w: ") { out shouldBe viaPairs(w) }
    }
    // semantics pinned: empty/inverted (40/50) and zero-probe
    // intervals emit nothing (inner-join parity); pts == istart is
    // counted, pts == iend is not (half-open)
    val out = Relational.rangeCountSumPrefix(p, ivals, "pts", "pv", "iid",
        "istart", "iend", 100L)
      .select("iid", "cnt", "sum").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out.keySet shouldBe Set(10L, 20L, 30L)
    out(10L) shouldBe ((3L, 120L)) // pids 3,4,5 (3 at ==istart; 6 at ==iend excluded)
    out(20L) shouldBe ((2L, 30L))  // pids 1,2
    out(30L) shouldBe ((2L, 150L)) // pids 7,8
  }

  test("rangeCountSumPrefix never builds the probe×interval pairs (no pair join)") {
    val p = probe.withColumn("pv", col("pid") * 10L)
    val plan = Relational
      .rangeCountSumPrefix(p, ivals, "pts", "pv", "iid", "istart", "iend", 100L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    // the only join is the bucket-prefix broadcast back onto the
    // union relation — u grows linearly in probes + 2·intervals
    plan should include("BroadcastHashJoin")
  }

  test("rangeJoinBucketed maxPairsPerBucket guard: fails fast on dense buckets, passes under budget") {
    // dense fixture: 50 probes and 20 single-bucket intervals all in
    // bucket 0 at width 1000 => worst bucket would emit 50*20 = 1000
    // candidate pairs
    val denseP = (0L until 50L).map(i => (i, i * 10L)).toDF("pid", "pts")
    val denseI = (0L until 20L).map(i => (100L + i, i * 5L, 500L + i * 5L))
      .toDF("iid", "istart", "iend")
    val e = intercept[IllegalArgumentException] {
      Relational.rangeJoinBucketed(denseP, denseI, "pts", "istart", "iend",
        bucketWidth = 1000L, maxPairsPerBucket = 999L)
    }
    // the failure message carries the operator's output-size contract:
    // aggregate consumers belong on rangeCountSumPrefix
    e.getMessage should include("rangeCountSumPrefix")
    // the same join under a sufficient budget matches its unguarded
    // result — the guard never drops pairs, it only refuses runs
    val guarded = Relational.rangeJoinBucketed(denseP, denseI, "pts",
        "istart", "iend", 1000L, maxPairsPerBucket = 1000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val unguarded = Relational.rangeJoinBucketed(denseP, denseI, "pts",
        "istart", "iend", 1000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    guarded shouldBe unguarded
    guarded should not be empty
    // and the aggregate consumer the contract points to handles the
    // same dense data without any pair materialization
    val agg = Relational.rangeCountSumPrefix(
      denseP.withColumn("pv", lit(1L)), denseI,
      "pts", "pv", "iid", "istart", "iend", 1000L)
    agg.count() shouldBe denseI.count()
  }

  test("rangeJoinBucketed plans an equi-join on the bucket — never a nested loop") {
    val plan = Relational
      .rangeJoinBucketed(probe, ivals, "pts", "istart", "iend", 100L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  private val aIvals = Seq(
    (1L, 0L, 350L),     // spans buckets 0-3 at width 100
    (2L, 90L, 110L),    // straddles one boundary
    (3L, 400L, 401L),   // sliver
    (4L, 500L, 500L))   // empty — overlaps nothing
    .toDF("aid", "a_s", "a_e")
  private val bIvals = Seq(
    (10L, 100L, 400L),  // overlaps 1 (multi-bucket shared span), 2, 3
    (20L, 340L, 360L),  // overlaps 1 only at its tail
    (30L, 0L, 90L),     // overlaps 1, NOT 2 (b_e == a_s boundary)
    (40L, 700L, 600L))  // inverted — overlaps nothing
    .toDF("bid", "b_s", "b_e")

  private def naiveOverlap = aIvals.crossJoin(bIvals)
    .where(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
    .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted

  test("intervalOverlapJoin matches the naive overlap join and emits each pair EXACTLY once") {
    for (w <- Seq(1L, 7L, 100L, 1000L)) {
      // compare as sorted SEQUENCES: a pair surfacing once per shared
      // bucket (the bug the max-start bucket rule prevents) would pass
      // a set compare but fail this one
      val out = Relational
        .intervalOverlapJoin(aIvals, bIvals, "a_s", "a_e", "b_s", "b_e", w)
        .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
      withClue(s"bucketWidth=$w: ") { out shouldBe naiveOverlap }
    }
  }

  test("intervalOverlapJoin pins half-open semantics: touching intervals do not overlap") {
    val out = Relational
      .intervalOverlapJoin(aIvals, bIvals, "a_s", "a_e", "b_s", "b_e", 100L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    out should contain((1L, 20L))      // tail overlap across a bucket boundary
    out should not contain ((2L, 30L)) // b ends exactly where a starts
    out should not contain ((3L, 20L)) // disjoint sliver
  }

  test("intervalOverlapJoin plans an equi-join on the bucket — never a nested loop") {
    val plan = Relational
      .intervalOverlapJoin(aIvals, bIvals, "a_s", "a_e", "b_s", "b_e", 100L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("seeded random parity: both bucketized joins match the naive join, duplicates included") {
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      // clustered starts + heavy-tailed lengths: intervals span 0..30+
      // buckets at width 16, plus empties/inverted and exact-boundary ts
      def ivals(n: Int, tag: Long) = (0 until n).map { i =>
        val s = rnd.nextInt(512).toLong
        val len = rnd.nextInt(6) match {
          case 0 => 0L                      // empty
          case 1 => -rnd.nextInt(40).toLong // inverted
          case _ => rnd.nextInt(500).toLong
        }
        (tag * 1000 + i, s, s + len)
      }
      val pr = (0 until 150).map(i => (i.toLong, (rnd.nextInt(36) * 16).toLong))
        .toDF("pid", "pts") // many ts exactly on bucket boundaries
      val as = ivals(60, 1).toDF("aid", "a_s", "a_e")
      val bs = ivals(60, 2).toDF("bid", "b_s", "b_e")

      val naiveRange = pr.crossJoin(as)
        .where(col("pts") >= col("a_s") && col("pts") < col("a_e"))
        .select("pid", "aid").as[(Long, Long)].collect().toSeq.sorted
      val gotRange = Relational.rangeJoinBucketed(pr, as, "pts", "a_s", "a_e", 16L)
        .select("pid", "aid").as[(Long, Long)].collect().toSeq.sorted
      withClue(s"seed=$seed range: ") { gotRange shouldBe naiveRange }

      // the raw two-sided predicate alone would also fire for INVERTED
      // intervals (e.g. a=[50,150) × b=(100,60]): "overlap" is only
      // meaningful for well-formed ones, which the operator's
      // end > start guard encodes — mirror it here
      val naiveOv = as.where(col("a_e") > col("a_s"))
        .crossJoin(bs.where(col("b_e") > col("b_s")))
        .where(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
        .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
      val gotOv = Relational
        .intervalOverlapJoin(as, bs, "a_s", "a_e", "b_s", "b_e", 16L)
        .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
      withClue(s"seed=$seed overlap: ") { gotOv shouldBe naiveOv }
    }
  }
}
