package graft


import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.VectorAggregates
import graft.streaming.StreamingAnalytics

/** Scale-machinery specs: watermarked windowed streaming aggregation,
  * the typed vector-mean Aggregator, and bucketed co-located joins
  * (exchange-free when both sides share bucketing).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked sliding-window aggregation finalizes windows and drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user", "value")
    val query = StreamingAnalytics.windowedEventStats(
      df, col("ts"), col("user"), col("value"),
      window = "10 seconds", slide = "10 seconds", watermark = "5 seconds")
      .writeStream.format("memory").queryName("win_stats").outputMode("append").start()
    def t(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")
    try {
      input.addData((t(1), 1L, 1.0), (t(3), 1L, 2.0), (t(2), 2L, 5.0))
      query.processAllAvailable()
      // advance the watermark past the [0,10) window, then send a LATE row for it
      input.addData((t(25), 1L, 9.0))
      query.processAllAvailable()
      input.addData((t(2), 1L, 100.0)) // late beyond watermark: dropped
      input.addData((t(35), 1L, 1.0))  // pushes watermark to 30, finalizing [20,30)
      query.processAllAvailable()

      val rows = spark.table("win_stats")
        .select("key", "n_events", "total").as[(Long, Long, Double)].collect().toSet
      rows should contain((1L, 2L, 3.0)) // [0,10) user 1: the late 100.0 NOT included
      rows should contain((2L, 1L, 5.0))
      rows should contain((1L, 1L, 9.0)) // [20,30)
    } finally query.stop()
  }

  test("meanVector Aggregator computes exact per-group centroids distributed") {
    val df = Seq(
      (0L, Array(1f, 3f)), (0L, Array(3f, 5f)),
      (1L, Array(10f, 0f)))
      .toDF("cell", "vec").repartition(4)
    val out = df.groupBy("cell")
      .agg(VectorAggregates.meanVectorCol(col("vec")).as("centroid"))
      .orderBy("cell").select("centroid").as[Array[Float]].collect()
    out(0).toSeq shouldBe Seq(2f, 4f)
    out(1).toSeq shouldBe Seq(10f, 0f)
  }

  test("distributed dictEncode ranks without a single-partition window and matches the window form") {
    val df = (1 to 5000).map(i => (s"k${i % 700}", i.toLong)).toDF("k", "ord").repartition(8)
    val win = graft.operators.Relational.dictEncode(df, col("k"), col("ord"), "code")
      .select(col("k"), col("ord"), col("code").cast("long").as("code"))
      .orderBy("ord").collect().map(_.toSeq).toSeq
    val dist = graft.operators.Relational.dictEncodeDistributed(df, col("k"), col("ord"), "code")
      .select(col("k"), col("ord"), col("code"))
      .orderBy("ord").collect().map(_.toSeq).toSeq
    dist shouldBe win
  }

  test("distributed dendrogram purity rolls up a 131k-leaf tree without collecting it") {
    // heap-numbered balanced binary tree: node i has parent i/2; leaves
    // are the bottom level, labeled cyclically. Built with spark.range —
    // the tree relation never exists on the driver.
    val depth = 17
    val leafStart = 1L << depth
    val tree = spark.range(1L, 2L * leafStart)
      .select(col("id").cast("string").as("uid"),
        when(col("id") > 1L, (col("id") / 2).cast("long").cast("string")).as("parent_uid"),
        when(col("id") >= leafStart, concat(lit("L"), col("id") % 64)).as("label"))
    val got = graft.operators.Trees.dendrogramPurityDF(tree)

    // expected from the bit-exact driver fold on the same (tiny-schema) rows
    val nodes = tree.collect().map(r =>
      graft.operators.Trees.TreeNode(r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSeq
    got shouldBe graft.operators.Trees.dendrogramPurity(nodes) +- 1e-9
  }

  test("streaming CC delta emission stays proportional to changes at 100k nodes") {
    import graft.streaming.StreamingComponents
    import graft.streaming.StreamingComponents.{EdgeEvent, UfState}
    // 100k-node ascending chain arriving over 100 batches: every merge
    // absorbs exactly the newly-seen node, so each batch must emit
    // ~batch-size rows (first-seen + moved), NOT the whole graph — the
    // old full-assignment shape would emit ~5M rows here (n × batches
    // / 2); the delta shape emits exactly n
    val n = 100000
    val batchSize = 1000
    var state = Option.empty[UfState]
    var emitted = 0L
    (0 until n - 1).grouped(batchSize).foreach { chunk =>
      val edges = chunk.map(i => EdgeEvent(0L, i.toLong, i.toLong, (i + 1).toLong))
      val (next, delta) = StreamingComponents.applyBatch(state, edges.toSeq)
      state = Some(next)
      emitted += delta.length
      // every emission in the ascending chain carries the one root
      delta.foreach(_.comp shouldBe 0L)
    }
    emitted shouldBe n // each node exactly once, ever
    state.get.parent.size shouldBe n
    // the worst case (descending arrival reparents the whole suffix
    // each batch) degrades to the OLD shape's volume, never past it:
    // per batch, moved ∪ new ⊆ all nodes seen so far
    var stateD = Option.empty[UfState]
    var emittedD = 0L
    var seen = 0L
    val nd = 5000
    ((nd - 1) to 1 by -1).grouped(500).foreach { chunk =>
      val edges = chunk.map(i => EdgeEvent(0L, (nd - i).toLong, i.toLong, (i - 1).toLong))
      val (next, delta) = StreamingComponents.applyBatch(stateD, edges.toSeq)
      stateD = Some(next)
      seen = next.parent.size.toLong
      delta.length.toLong should be <= seen
      emittedD += delta.length
    }
    stateD.get.parent.size shouldBe nd
  }

  test("split routing matches the global-window form without single-partitioning the input") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 5000).map(i => ((i * 37 % 1000).toLong, i.toLong)).toDF("d", "k").repartition(8)
    // the old (audit-flagged) formulation, kept here as the semantics model
    val win = Window.orderBy(col("d"), col("k"))
    val expected = df.withColumn("_rn", row_number().over(win))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("split",
        when(col("_rn") <= lit(0.6) * col("_n"), "train")
          .when(col("_rn") <= lit(0.8) * col("_n"), "dev")
          .otherwise("test"))
      .select("d", "k", "split").orderBy("d", "k").collect().map(_.toSeq).toSeq
    val got = graft.operators.Relational.splitRouting(df, Seq(col("d"), col("k")))
      .select("d", "k", "split").orderBy("d", "k").collect().map(_.toSeq).toSeq
    got shouldBe expected
    val cnt = got.groupBy(_(2)).view.mapValues(_.size).toMap
    cnt("train") shouldBe 3000
    cnt("dev") shouldBe 1000
    cnt("test") shouldBe 1000
  }

  test("bucketed tables join without a shuffle exchange on the join key") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: no ShuffleExchange feeding the join
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldBe 1000L
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
