package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Specs for the training-data hygiene operators (p10 stratified
  * sampling, t5 decontamination, t6 repetition — the query-level logic
  * lives in QueriesText; the parts with reusable operator surface are
  * exercised here directly).
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample: deterministic across runs and partitionings") {
    val df = (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else "de")).toDF("id", "lang")
    def run(parts: Int) = Sampling.stratifiedSample(
      df.repartition(parts), col("lang"), col("id"), Map("en" -> 50), defaultRate = 20)
      .select("id").as[Long].collect().toSet
    val a = run(2)
    a shouldBe run(7) // partitioning-invariant
    a shouldBe run(2) // run-invariant
  }

  test("stratifiedSample: per-stratum rates roughly honored, zero rate excludes all") {
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "zz")).toDF("id", "lang")
    val kept = Sampling.stratifiedSample(
      df, col("lang"), col("id"), Map("en" -> 50, "zz" -> 0), defaultRate = 0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    kept.getOrElse("zz", 0L) shouldBe 0L
    // hash-uniformity: 50% of 1000 within a loose band
    kept("en") should be > 350L
    kept("en") should be < 650L
  }

  test("stratifiedSample: rate 100 keeps every row") {
    val df = (0L until 100L).map(i => (i, "en")).toDF("id", "lang")
    Sampling.stratifiedSample(df, col("lang"), col("id"), Map.empty, defaultRate = 100)
      .count() shouldBe 100L
  }

  test("quotaSample: exactly min(k, stratum size) per stratum, partitioning-invariant") {
    val df = (0L until 900L)
      .map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh"))
      .toDF("id", "lang")
      .union(Seq((9000L, "rare"), (9001L, "rare")).toDF("id", "lang"))
    def run(parts: Int) = Sampling.quotaSample(
      df.repartition(parts), col("lang"), col("id"), k = 5)
      .select("id", "lang").as[(Long, String)].collect().toSet
    val a = run(2)
    a shouldBe run(7) // partitioning-invariant
    val perLang = a.groupBy(_._2).map { case (l, rows) => l -> rows.size }
    perLang("en") shouldBe 5
    perLang("de") shouldBe 5
    perLang("zh") shouldBe 5
    perLang("rare") shouldBe 2 // stratum smaller than the quota: keep all
  }

  test("quotaSample: the rank filter compiles to WindowGroupLimit (map-side top-k per stratum)") {
    val df = (0L until 1000L).map(i => (i, s"s${i % 4}")).toDF("id", "lang").repartition(8)
    val plan = Sampling.quotaSample(df, col("lang"), col("id"), k = 5)
      .queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }

  test("temperatureMix: small sources up-weighted, selection partitioning-invariant") {
    // 900 docs in "big", 100 in "small": raw shares 90%/10%, T=2
    // targets ∝ √n → small's PER-DOC keep rate should be 3× big's
    val df = ((0L until 900L).map(i => (i, "big")) ++ (900L until 1000L).map(i => (i, "small")))
      .toDF("id", "src")
    def run(parts: Int) = Sampling.temperatureMix(
      df.repartition(parts), col("src"), col("id"), keepFrac = 0.3)
      .select("id", "src", "rate").as[(Long, String, Long)].collect().toSet
    val out = run(2)
    out shouldBe run(7) // partitioning-invariant
    val rates = out.groupBy(_._2).map { case (s, rows) => s -> rows.head._3 }
    // √900 : √100 = 3 : 1 normalized over per-source size 900 : 100
    // → per-doc rates 0.3·1000·30/(40·900) vs 0.3·1000·10/(40·100)
    rates("small").toDouble / rates("big").toDouble shouldBe 3.0 +- 0.01
    // kept counts land near the binomial expectation of their rates
    val kept = out.groupBy(_._2).map { case (s, rows) => s -> rows.size.toLong }
    kept("big") should be((900L * rates("big") / 10000L) +- 30L)
    kept("small") should be((100L * rates("small") / 10000L) +- 20L)
  }

  test("bottomKSample: exactly k rows, partitioning-invariant, mergeable") {
    val df = (0L until 1000L).map(i => (i, s"t$i")).toDF("id", "v")
    def run(parts: Int) = Sampling.bottomKSample(df.repartition(parts), col("id"), k = 50)
      .select("id").as[Long].collect().toSet
    val a = run(2)
    a.size shouldBe 50
    a shouldBe run(9) // partitioning-invariant
    // merge law: bottom-k of a union == bottom-k of the parts' bottom-k's
    val left = df.where(col("id") < 400)
    val right = df.where(col("id") >= 400)
    val merged = Sampling.bottomKSample(
      Sampling.bottomKSample(left, col("id"), 50)
        .union(Sampling.bottomKSample(right, col("id"), 50)), col("id"), 50)
      .select("id").as[Long].collect().toSet
    merged shouldBe a
  }

  test("bottomKSample: compiles to TakeOrderedAndProject (no global sort)") {
    val df = (0L until 1000L).map(i => (i, s"t$i")).toDF("id", "v").repartition(8)
    val plan = Sampling.bottomKSample(df, col("id"), k = 50)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    plan should not include "Sort ["
  }

  test("histogramQuantiles matches brute-force sorted-rank percentiles") {
    // skewed lengths so the percentiles actually separate
    val vals = (0 until 500).map(i => (i.toLong, (i % 7) + (if (i % 50 == 0) 400L else i % 23)))
    val df = vals.toDF("id", "v").repartition(8)
    val out = graft.operators.Quantiles
      .histogramQuantiles(spark, df, col("v"), Seq(50, 90, 95, 99), "v")
      .as[(Long, Long)].collect().toMap
    val sorted = vals.map(_._2).sorted
    val n = sorted.length
    for (p <- Seq(50, 90, 95, 99)) {
      val rank = (p * n + 99) / 100 // ⌈p·N/100⌉ for positive ints
      withClue(s"p$p: ") { out(p.toLong) shouldBe sorted(rank - 1) }
    }
    val byPct = out.toSeq.sortBy(_._1).map(_._2)
    byPct shouldBe byPct.sorted // nondecreasing in p
  }

  test("groupedHistogramQuantiles: per-stratum sorted-rank parity, no single-partition exchange") {
    val vals = (0 until 600).map { i =>
      val g = s"s${i % 3}"
      (i.toLong, g, (i % (11 + (i % 3) * 6)).toLong) // different spread per stratum
    }
    val df = vals.toDF("id", "g", "v").repartition(8)
    val out = graft.operators.Quantiles
      .groupedHistogramQuantiles(spark, df, col("g"), col("v"), Seq(50, 95), "v")
      .as[(String, Long, Long)].collect()
      .map { case (g, p, v) => (g, p) -> v }.toMap
    for (g <- Seq("s0", "s1", "s2"); p <- Seq(50, 95)) {
      val sorted = vals.filter(_._2 == g).map(_._3).sorted
      val rank = (p * sorted.length + 99) / 100
      withClue(s"$g p$p: ") { out((g, p.toLong)) shouldBe sorted(rank - 1) }
    }
    // the grouped form's whole point: every window/agg partitions by the
    // stratum — no single-partition exchange anywhere
    val plan = graft.operators.Quantiles
      .groupedHistogramQuantiles(spark, df, col("g"), col("v"), Seq(50, 95), "v")
      .queryExecution.executedPlan.toString
    plan should not include "SinglePartition"
  }

  test("t6 repetition flags a looping document, passes natural text") {
    val docs = Seq(
      (0L, "spam ham eggs " * 20 + "spam ham eggs"), // one trigram dominates
      (1L, (0 until 60).map(i => s"w$i").mkString(" "))) // all trigrams distinct
      .toDF("doc_id", "text")
    // run the same aggregation shape as the t6 query
    val tris = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(col("text")), 3)).as("tri"))
    val out = tris.groupBy("doc_id", "tri").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("max_rep"), sum("c").as("n_tris"))
      .withColumn("repetitive", col("max_rep") * 10 >= col("n_tris"))
      .select("doc_id", "repetitive").as[(Long, Boolean)].collect().toMap
    out(0L) shouldBe true
    out(1L) shouldBe false
  }

  test("t7 bloom decontamination never misses a t5 exact contamination (no false negatives)") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val exact = QueriesText.queries("t5_decontamination")(spark, dir)
      .select("doc_id", "overlap_n", "contaminated")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val bloom = QueriesText.queries("t7_bloom_decontam")(spark, dir)
      .select("doc_id", "n_hit", "contaminated")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    bloom.keySet shouldBe exact.keySet
    // the bloom holds the UNION of bench shingles: per doc, hits can
    // only exceed the best single-bench-doc overlap, so t5's
    // contaminated set must be contained in t7's
    exact.foreach { case (doc, (overlap, cont)) =>
      val (hits, bcont) = bloom(doc)
      withClue(s"doc=$doc: ") {
        hits should be >= overlap
        if (cont) bcont shouldBe true
      }
    }
    // and the filter must still discriminate: not everything flagged
    bloom.values.count(_._2) should be < bloom.size
    bloom.values.count(_._2) should be >= exact.values.count(_._2)
  }

  test("k3 CMS estimates never under-count and are run-deterministic") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    def run() = QueriesRelational.queries("k3_cms_topk")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val out = run()
    out.length shouldBe 5
    out.foreach { case (user, cms, exact) =>
      withClue(s"user=$user: ") { cms should be >= exact } // CMS only over-estimates
    }
    // the sketch is deterministic: a rebuild returns the same rows
    run() shouldBe out
  }

  test("t8 top-ngrams: deterministic boundary ties and a TakeOrdered plan (no global sort)") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val df = QueriesText.queries("t8_top_ngrams")(spark, dir)
    val out = df.as[(String, Long)].collect().toSeq
    out.length shouldBe 50
    // the (cnt desc, ngram asc) total order makes the boundary cut
    // deterministic even when many bigrams tie at the 50th count
    out shouldBe out.sortBy { case (g, c) => (-c, g) }
    val plan = df.queryExecution.executedPlan.toString
    plan should include ("TakeOrderedAndProject")
  }

  test("dupNgramStats: matches a brute-force recount and the whole t10 query plan has no shuffle") {
    import graft.functions.TextFunctions
    val rnd = new scala.util.Random(7)
    val docs = (0L until 200L).map { id =>
      (id, Seq.fill(rnd.nextInt(40))(s"w${rnd.nextInt(8)}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for (n <- 2 to 4) {
      val got = df.select(col("doc_id"),
          TextFunctions.dupNgramStats(TextFunctions.tokens(col("text")), n).as("st"))
        .select(col("doc_id"), col("st.dup_occ"), col("st.n_ngrams"))
        .as[(Long, Long, Long)].collect().map { case (id, d, t) => id -> ((d, t)) }.toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ", -1).toSeq
        val grams = if (toks == Seq("")) Seq.empty
                    else toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).map { case (g, o) => g -> o.size }
        val dup = grams.count(g => counts(g) >= 2).toLong
        withClue(s"doc=$id n=$n: ") { got(id) shouldBe ((dup, grams.length.toLong)) }
      }
    }
    // per-doc quality signals must stay a scan: no aggregation shuffle
    // anywhere in the plan (the only exchange is the final ORDER BY's
    // range partitioning, which exists for the oracle compare)
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = QueriesText.queries("t10_dup_ngrams")(spark, dir)
      .queryExecution.executedPlan.toString
    (plan should not).include("hashpartitioning")
    (plan should not).include("HashAggregate")
  }

  test("t11 LM score: corpus-common text outranks rare text, short docs surface with NULL") {
    import org.apache.spark.sql.functions.{col, lit}
    val common = "the cat sat on the mat"
    val docs = (
      (0L until 10L).map(id => (id, common)) :+        // 10 copies: very common bigrams
      (100L, "zq xv unique bigrams never repeat") :+   // rare text
      (101L, "solo")                                   // 1 token: no bigrams
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("t11spec").toString
    docs.select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"),
        org.apache.spark.sql.functions.length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = QueriesText.queries("t11_lm_score")(spark, dir)
      .select("doc_id", "n_bigrams", "score_pm")
      .as[(Long, Long, Option[Long])].collect()
      .map { case (id, m, sc) => id -> ((m, sc)) }.toMap
    out(0L)._1 shouldBe 5L
    out(0L)._2.get shouldBe 100000L            // every bigram occurs 10x: mean 10 → 10000*10
    out(100L)._2.get shouldBe 10000L           // all bigrams unique: mean 1
    out(0L)._2.get should be > out(100L)._2.get
    out(101L) shouldBe ((0L, None))            // bigram-less doc: NULL score, still present
  }

  test("t12 BPE merges: the learned pair fuses corpus-wide and vanishes from round 2") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = (
      (0L until 20L).map(id => (id, "big cat runs fast")) :+     // 'big cat' dominates
      (100L, "big cat big cat big cat") :+                       // adjacent repeats: greedy fuse
      (101L, "small dog runs fast")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("t12spec").toString
    docs.select(col("doc_id"), col("text"), lit("en").as("lang"), lit("src0").as("source"),
        org.apache.spark.sql.functions.length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = QueriesText.queries("t12_bpe_merges")(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    val r1 = out.filter(_._1 == 1L)
    val r2 = out.filter(_._1 == 2L)
    r1.head shouldBe ((1L, "big cat", 23L)) // 20 + 3 occurrences, the top pair
    // after fusing, 'big cat' is gone and the fused token forms new pairs
    r2.map(_._2) should not contain "big cat"
    r2.map(_._2) should contain ("big_cat runs")       // 20 docs
    r2.map(_._2) should contain ("big_cat big_cat")    // greedy left-to-right on the repeat doc
    // a metachar-bearing top pair is skipped (clean-word restriction):
    // the merge picks the clean runner-up instead of throwing
    val dirty = (0L until 9L).map(id => (id, "costs $9 now")).toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("t12dirty").toString
    dirty.select(col("doc_id"), col("text"), lit("en").as("lang"), lit("src0").as("source"),
        org.apache.spark.sql.functions.length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out2 = QueriesText.queries("t12_bpe_merges")(spark, dir2)
      .as[(Long, String, Long)].collect().toSeq
    // "costs $9" and "$9 now" (9 each) are dirty; no clean pair exists,
    // so no merge happens and round 2 equals round 1
    out2.filter(_._1 == 1L).toSet shouldBe out2.filter(_._1 == 2L).map(r => (1L, r._2, r._3)).toSet
  }

  test("w6 sliding distinct: exact trailing-7-day counts match brute force, sketch tracks them") {
    import org.apache.spark.sql.functions.{col, lit}
    val dayNs = 86400000000000L
    // user u is active on days u%15 and (u%15)+3
    val events = (0L until 600L).flatMap { u =>
      Seq((u % 15) * dayNs + u, ((u % 15) + 3) * dayNs + u).map(ts => (ts, u))
    }
    val dir = java.nio.file.Files.createTempDirectory("w6spec").toString
    events.toDF("ts", "user_id")
      .withColumn("event_id", col("user_id"))
      .withColumn("event_type", lit("view"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = QueriesRelational.queries("w6_sliding_distinct")(spark, dir)
      .as[(Long, Double, Long)].collect().map { case (d, e, x) => d -> ((e, x)) }.toMap
    // brute-force exact trailing-7-day distinct per day
    val byDay = events.map { case (ts, u) => (ts / dayNs, u) }
    val days = byDay.map(_._1).distinct.sorted
    days.foreach { d =>
      val expect = byDay.filter { case (dd, _) => dd >= d - 6 && dd <= d }.map(_._2).distinct.size.toLong
      withClue(s"day=$d: ") {
        out(d)._2 shouldBe expect
        // deterministic HLL (m=64): estimate within 35% of truth here
        math.abs(out(d)._1 - expect) / expect.toDouble should be < 0.35
      }
    }
  }

  test("packSequences: per-shard intervals tile the stream exactly and chunk ids are consistent") {
    val df = (0L until 500L).map(i => (i, 1L + i % 37)).toDF("id", "ntok")
    val packed = graft.operators.Packing.packSequences(
      df, col("id"), col("ntok"), shards = 4, seqLen = 64)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    packed.length shouldBe 500
    // within each shard, sorted by tok_start, the intervals tile [0, total)
    packed.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._3)
      withClue(s"shard=$shard: ") {
        sorted.head._3 shouldBe 0L
        sorted.sliding(2).foreach {
          case Seq((_, _, _, aEnd, _, _), (_, _, bStart, _, _, _)) => bStart shouldBe aEnd
          case _ => ()
        }
      }
    }
    // chunk ids are the floor-div of the interval bounds
    packed.foreach { case (_, _, s0, e0, f, l) =>
      f shouldBe s0 / 64
      l shouldBe math.max(s0, e0 - 1) / 64
    }
  }

  test("packSequences: partitioning-invariant, window partitioned by shard (no single-partition sort)") {
    val df = (0L until 1000L).map(i => (i, 1L + i % 11)).toDF("id", "ntok")
    def run(parts: Int) = graft.operators.Packing.packSequences(
      df.repartition(parts), col("id"), col("ntok"), shards = 8, seqLen = 32)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val a = run(2)
    a shouldBe run(7)
    // a zero-token document occupies an empty interval at its slot
    val withEmpty = (0L until 50L).map(i => (i, if (i == 25L) 0L else 5L)).toDF("id", "ntok")
    val rows = graft.operators.Packing.packSequences(
      withEmpty, col("id"), col("ntok"), shards = 2, seqLen = 16)
      .where(col("tok_start") === col("tok_end"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    rows.length shouldBe 1
    rows.head._5 shouldBe rows.head._6 // first_seq == last_seq
    // the physical window is partitioned by shard — no WindowExec over a
    // single partition (the per-writer topology that survives 100x)
    val plan = graft.operators.Packing.packSequences(
      df, col("id"), col("ntok"), shards = 8, seqLen = 32)
      .queryExecution.executedPlan.toString
    plan should include ("Window")
    (plan should not).include("SinglePartition")
  }
}
