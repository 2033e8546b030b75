package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{GreedyClustering, Metrics, Projections, Sampling}
import graft.operators.GreedyClustering.Params

/** End-to-end composition tests: the reference's E1/E2 pipeline shapes
  * (SURVEY §3) — encode mentions → similarity → greedy clustering →
  * metric evaluation — plus the sampling/pretty-printing stragglers.
  */
class PipelineE1Spec extends SparkSpec {
  import spark.implicits._

  test("E1/E2 shape: hash-encode -> greedy cluster -> MUC/B3 eval reaches F1 1.0 on separable mentions") {
    // two entities; same-entity mentions repeat the surface string, so
    // within-entity cosine is exactly 1 and cross-entity cosine is a
    // fixed pseudo-random value well below the 0.99 threshold
    val mentions = Seq(
      (0L, "aardvark", "E1"), (1L, "zymurgy", "E2"), (2L, "aardvark", "E1"),
      (3L, "zymurgy", "E2"), (4L, "aardvark", "E1"))
      .toDF("mention_index", "mention", "entity_id")

    // F4-boundary toy encoder over char trigram "tokens"
    val encoded = mentions.withColumn("embedding",
      TextFunctions.hashEmbed(
        expr("transform(sequence(1, greatest(length(mention)-2, 1)), i -> substring(mention, i, 3))"), 16))

    val clustered = GreedyClustering.clusterSorted(
      encoded, col("mention_index"), col("embedding"), col("mention_index"),
      Params("backwards", limit = -1, threshold = 0.99, cosine = true))

    val assign = clustered.join(mentions, col("id") === col("mention_index"))
    val (p, r, f) = {
      val row = Metrics.muc(assign, col("entity_id"), col("pred_cluster")).collect().head
      (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    }
    p shouldBe 1.0 +- 1e-9
    r shouldBe 1.0 +- 1e-9
    f shouldBe 1.0 +- 1e-9

    val b3 = Metrics.bCubed(assign, col("entity_id"), col("pred_cluster")).collect().head
    b3.getDouble(2) shouldBe 1.0 +- 1e-6
  }

  test("A13 triplet sampler: positives share an entity, negative differs, deterministic") {
    val df = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"),
      (6L, "C")) // singleton: no triplet anchored on C
      .toDF("id", "entity")
    val out = Sampling.tripletSample(df, col("entity"), col("id"))
      .orderBy("entity")
      .select("entity", "pos_1", "pos_2", "neg_entity", "neg")
      .as[(String, Long, Long, String, Long)].collect()

    out.map(_._1).toSeq shouldBe Seq("A", "B") // only multi-mention entities anchor
    out.foreach { case (e, p1, p2, ne, _) =>
      p1 should not be p2
      ne should not be e
    }
    val idToEntity = Map(1L -> "A", 2L -> "A", 3L -> "A", 4L -> "B", 5L -> "B", 6L -> "C")
    out.foreach { case (e, p1, p2, ne, n) =>
      idToEntity(p1) shouldBe e
      idToEntity(p2) shouldBe e
      idToEntity(n) shouldBe ne
    }
    // deterministic across runs
    val again = Sampling.tripletSample(df, col("entity"), col("id"))
      .orderBy("entity").select("entity", "pos_1", "pos_2", "neg_entity", "neg")
      .as[(String, Long, Long, String, Long)].collect()
    again.toSeq shouldBe out.toSeq
  }

  test("batched-inference boundary matches the hashEmbed expression bit-for-bit") {
    import graft.operators.BatchedInference
    import graft.functions.TextFunctions
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "delta"), (2L, "x y z w v"),
      (3L, "one two"), (4L, "alpha alpha"), (5L, "q"), (6L, "seven words in a row here now"))
      .toDF("uid", "text")
    val viaBoundary = BatchedInference.encodeMentions(
      docs, col("uid"), TextFunctions.tokens(col("text")),
      batchSize = 3, BatchedInference.hashEncoder(8))
      .orderBy("uid").select("embedding").as[Array[Float]].collect()
    val viaExpr = docs
      .select(col("uid"), TextFunctions.hashEmbed(TextFunctions.tokens(col("text")), 8).as("e"))
      .orderBy("uid").select("e").as[Array[Float]].collect()
    viaBoundary.map(_.toSeq) shouldBe viaExpr.map(_.toSeq)
  }

  test("e1 PII scrub stage: planted spans fully redacted, token counts shift for planted docs only") {
    // the exact plant+redact pair e1 composes between decontamination
    // and mixing (and t13 checks standalone)
    val docs = Seq(
      (21L, "plain words here"),           // 21 % 7 = 0 → email planted
      (25L, "more plain words"),           // 25 % 11 = 3 → phone planted
      (22L, "untouched document text"),    // neither
      (70L, "both kinds"))                 // 70 % 7 = 0 (no phone: 70 % 11 = 4)
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      QueriesText.redactPii(QueriesText.plantPii(col("text"), col("doc_id"))).as("clean"),
      col("text"))
      .withColumn("leftover_emails", regexp_count(col("clean"), lit(QueriesText.PiiEmailRe)))
      .withColumn("leftover_phones", regexp_count(col("clean"), lit(QueriesText.PiiPhoneRe)))
      .as[(Long, String, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    // nothing PII-shaped survives the scrub, ever
    out.values.foreach { case (id, clean, _, e, p) =>
      withClue(s"doc $id: ") { e shouldBe 0; p shouldBe 0 }
    }
    // planted docs carry the placeholder; untouched docs are byte-identical
    out(21L)._2 should include("<EMAIL>")
    out(25L)._2 should include("<PHONE>")
    out(22L)._2 shouldBe out(22L)._3
    // the scrub happens BEFORE token counting in e1: planted docs gain
    // exactly the plant's extra whitespace tokens ("contact <EMAIL> for
    // details" = +4; "call <PHONE> now" = +3)
    def ntok(s: String) = s.split(" ").length
    ntok(out(21L)._2) shouldBe ntok(out(21L)._3) + 4
    ntok(out(25L)._2) shouldBe ntok(out(25L)._3) + 3
    ntok(out(22L)._2) shouldBe ntok(out(22L)._3)
  }

  test("P5 LaTeX escape + context ellipsis") {
    val df = Seq(("a_b & c%", "one two three four")).toDF("s", "ctx")
    val out = df.select(
      Projections.latexEscape(col("s")).as("esc"),
      Projections.ellipsisLeft(col("ctx"), 2).as("l"),
      Projections.ellipsisRight(col("ctx"), 2).as("r")).collect().head
    out.getString(0) shouldBe "a\\_b \\& c\\%"
    out.getString(1) shouldBe "three four"
    out.getString(2) shouldBe "one two"
  }
}
