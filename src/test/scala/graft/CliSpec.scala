package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import graft.cli.Cli

/** Drives the CLI surface end-to-end through real files: the reference
  * user's E1/E2 workflow — preprocess → embed → cluster → evaluate —
  * executed as commands over the reference's own file formats.
  */
class CliSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-cli").toString + "/" + name

  private def captureOut(body: => Unit): String = {
    val bos = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(bos))(body)
    bos.toString("UTF-8")
  }

  test("parseFlags accepts bare boolean flags and rejects stray tokens") {
    Cli.parseFlags(Array("--dot-prod", "--input", "x")) shouldBe
      Map("dot-prod" -> "true", "input" -> "x")
    Cli.parseFlags(Array("--input", "x", "--dot-prod")) shouldBe
      Map("dot-prod" -> "true", "input" -> "x")
    an[IllegalArgumentException] should be thrownBy Cli.parseFlags(Array("oops"))
  }

  test("preprocess-pubtator emits globally unique mention_index and list-typed type") {
    val pub = tmp("uid.pubtator")
    Files.writeString(java.nio.file.Paths.get(pub),
      """1|t|alpha beta
        |1|a|more text
        |1	0	5	alpha	T1,T9	C01
        |1	6	10	beta	T2	C02
        |
        |2|t|alpha beta again
        |2|a|words
        |2	0	5	alpha	T1	C01
        |2	6	10	beta	T2	C02
        |""".stripMargin)
    val out = tmp("uid-mentions")
    Cli.run(spark, "preprocess-pubtator", Map("input" -> pub, "output" -> out))
    val rows = spark.read.schema(graft.sources.Sources.mentionSchema).json(out)
    import org.apache.spark.sql.functions.col
    rows.select("mention_index").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(0L, 1L, 2L, 3L) // global, not per-document
    rows.select("document_index").distinct().count() shouldBe 2
    rows.where(col("mention_index") === 0)
      .select("type").collect().head.getSeq[String](0) shouldBe Seq("T1", "T9")
  }

  test("pretokenize windows + pads mention rows and labels from the entity vocab") {
    // hand-computed golden of _encode_mention's accounting at
    // max-len 12 (utils.py:80-106): context budget = 12 − (|m|+2) − 2,
    // halves redistribute slack from the short side to the long one
    val in = tmp("ptk.jsonl")
    Files.writeString(java.nio.file.Paths.get(in),
      """{"mention_index":0,"left_context":"a b c d e","mention":"m1 m2","right_context":"r1","entity_id":"Q1"}
        |{"mention_index":1,"left_context":"","mention":"x","right_context":"","entity_id":"Q2"}
        |""".stripMargin)
    val vocabDir = tmp("ptk-vocab")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(vocabDir))
    Files.writeString(java.nio.file.Paths.get(vocabDir + "/vocab.csv"),
      "[PAD],0\nQ1,5\nQ2,3\n")
    val out = tmp("ptk-out")
    Cli.run(spark, "pretokenize", Map("input" -> in, "output" -> out,
      "entity-vocab" -> (vocabDir + "/vocab.csv"), "max-len" -> "12"))
    val rows = spark.read.json(out)
      .select("mention_index", "input_tokens", "attention_mask", "label")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList,
        r.getSeq[Long](2).toList, r.getLong(3))).sortBy(_._1).toList
    // row 0: budget 6, halves 3/3; right has 1 → left absorbs 2 → 5/1;
    // body fills the window exactly, no padding, full mask
    rows(0) shouldBe ((0L,
      List("[CLS]", "a", "b", "c", "d", "e", "[E_START]", "m1", "m2", "[E_END]", "r1", "[SEP]"),
      List.fill(12)(1L), 1L))
    // row 1: both contexts empty — tokenize("") must be [], not [""];
    // 5 real slots, 7 [PAD]s, mask 1×5 0×7; Q2 → vocab row 2
    rows(1) shouldBe ((1L,
      List("[CLS]", "[E_START]", "x", "[E_END]", "[SEP]") ::: List.fill(7)("[PAD]"),
      List.fill(5)(1L) ::: List.fill(7)(0L), 2L))
    // unknown entity fails loudly instead of growing the vocab
    val bad = tmp("ptk-bad.jsonl")
    Files.writeString(java.nio.file.Paths.get(bad),
      """{"mention_index":0,"left_context":"","mention":"x","right_context":"","entity_id":"NOPE"}
        |""".stripMargin)
    val e = intercept[Exception] {
      Cli.run(spark, "pretokenize", Map("input" -> bad, "output" -> tmp("ptk-bad-out"),
        "entity-vocab" -> (vocabDir + "/vocab.csv"), "max-len" -> "12"))
    }
    e.getMessage should include("entity not in vocab")
  }

  test("preprocess-zeshel joins the two-file corpus into mention + entity rows") {
    val docs = tmp("zdocs"); val ments = tmp("zments"); val out = tmp("zout")
    Files.createDirectories(java.nio.file.Paths.get(docs))
    Files.createDirectories(java.nio.file.Paths.get(ments))
    Files.writeString(java.nio.file.Paths.get(docs + "/d.json"), Seq(
      """{"document_id": "D1", "title": "Alpha", "text": "w0 w1 w2 w3 w4", "category": "cat_a"}""",
      """{"document_id": "L1", "title": "Ent One", "text": "Ent One is great", "category": "cat_b"}""").mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(ments + "/m.json"),
      """{"context_document_id": "D1", "label_document_id": "L1", "start_index": 1, "end_index": 2}""")
    Cli.run(spark, "preprocess-zeshel", Map("documents" -> docs, "mentions" -> ments, "output" -> out))
    val rows = spark.read.json(out).orderBy("mention_index").collect()
    rows.length shouldBe 2
    rows(0).getAs[String]("mention") shouldBe "w1 w2"
    rows(0).getAs[String]("entity_id") shouldBe "Ent One"
    rows(0).getAs[Long]("mention_index") shouldBe 0L
    rows(1).getAs[String]("mention") shouldBe "Ent One"
    rows(1).getAs[String]("right_context") shouldBe "is great"
    rows(1).getAs[Long]("mention_index") shouldBe 1L
  }

  test("preprocess-aida drops --NME-- mentions and numbers the stream globally") {
    val in = tmp("aida.conll"); val out = tmp("aida-out")
    Files.writeString(java.nio.file.Paths.get(in),
      "-DOCSTART- (1 EU)\nalpha\tB\talpha\tE0\nbeta\tB\tbeta\t--NME--\ngamma\n\n" +
        "-DOCSTART- (2 T)\ndelta\tB\tdelta\tE1\nq7\n")
    Cli.run(spark, "preprocess-aida", Map("input" -> in, "output" -> out))
    val rows = spark.read.json(out).orderBy("mention_index").collect()
    rows.map(_.getAs[String]("entity_id")).toSeq shouldBe Seq("E0", "E1") // --NME-- dropped
    rows.map(_.getAs[Long]("mention_index")).toSeq shouldBe Seq(0L, 1L)
    rows.map(_.getAs[String]("document_id")).toSeq shouldBe Seq("1 EU", "2 T")
  }

  test("preprocess-ecbplus parses an XML corpus under the gold-sentence CSV") {
    val dir = tmp("ecb"); val out = tmp("ecb-out"); val goldCsv = tmp("gold.csv")
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val xml =
      """<Document doc_name="3_2ecb.xml">
        |<token t_id="1" sentence="0" number="0">Officials</token>
        |<token t_id="2" sentence="0" number="1">said</token>
        |<token t_id="3" sentence="0" number="2">the</token>
        |<token t_id="4" sentence="0" number="3">fire</token>
        |<token t_id="5" sentence="1" number="0">It</token>
        |<token t_id="6" sentence="1" number="1">burned</token>
        |<Markables>
        |<NON_HUMAN_PART m_id="2"><token_anchor t_id="3"/><token_anchor t_id="4"/></NON_HUMAN_PART>
        |<HUMAN_PART m_id="5"><token_anchor t_id="5"/></HUMAN_PART>
        |</Markables>
        |<Relations>
        |<CROSS_DOC_COREF r_id="r9"><source m_id="2"/><source m_id="5"/></CROSS_DOC_COREF>
        |</Relations>
        |</Document>""".stripMargin
    Files.writeString(java.nio.file.Paths.get(dir + "/3_2ecb.xml"), xml)
    Files.writeString(java.nio.file.Paths.get(goldCsv),
      "Topic,File,Sentence Number\n3,2ecb,0\n")
    Cli.run(spark, "preprocess-ecbplus", Map(
      "input" -> dir, "gold-csv" -> goldCsv, "output" -> out))
    val rows = spark.read.json(out).collect()
    // sentence-1 markable (m_id 5) is outside the gold sentences
    rows.map(r => (r.getAs[String]("mention"), r.getAs[String]("entity_id"))).toSet shouldBe
      Set(("the fire", "r9"))
    rows.head.getAs[String]("document_id") shouldBe "3_2ecb.xml"
  }

  test("E2 workflow: preprocess-pubtator -> embed -> nn-thresh -> eval-clusters") {
    // PubTator input with two entities, two mentions each (identical
    // surface strings so the hash encoder separates them perfectly)
    val pub = tmp("in.pubtator")
    Files.writeString(java.nio.file.Paths.get(pub),
      """1|t|alpha beta
        |1|a|more text
        |1	0	5	alpha	T1	C01
        |1	6	10	beta	T2	C02
        |
        |2|t|alpha beta again
        |2|a|words
        |2	0	5	alpha	T1	C01
        |2	6	10	beta	T2	C02
        |""".stripMargin)

    val mentions = tmp("mentions")
    Cli.run(spark, "preprocess-pubtator", Map("input" -> pub, "output" -> mentions))
    spark.read.json(mentions).count() shouldBe 4

    val emb = tmp("emb")
    Cli.run(spark, "embed", Map("input" -> mentions, "output" -> emb, "dim" -> "16"))

    val pairs = tmp("pairs")
    Cli.run(spark, "nn-thresh", Map(
      "input" -> emb, "output" -> pairs, "strategy" -> "backwards", "threshold" -> "0.99"))

    val report = captureOut {
      Cli.run(spark, "eval-clusters", Map("input" -> pairs))
    }
    report should include regex "muc_f1\\s+1\\.000000"
    report should include regex "b3_f1\\s+1\\.000000"
    report should include("n_true_clusters 2")
    report should include("n_pred_clusters 2")
  }

  test("grinch --output pairs match the reference CLI executed on the same fixture") {
    // fixture + goldens produced by EXECUTING meercat/cluster_w_grinch.py
    // (scripts/gen_cli_grinch_goldens.py): explicit-threshold cut,
    // bisection to the entity count, and the reference CLI's default
    // similarity-strategy pruning with the memory bound live
    def resource(name: String): String = {
      val url = getClass.getResource(s"/cli/$name")
      require(url != null, s"missing test resource cli/$name")
      url.getPath
    }
    // pred cluster ids are arbitrary BFS indices: a ULP churn graft in
    // the reference (see GrinchGraftPropertySpec point 2 — the engine
    // computes both graft sides in double and skips the no-op graft the
    // reference's float32 batch path performs) renumbers sibling
    // subtrees without changing the partition. Canonicalize pred ids by
    // first occurrence on BOTH sides and compare (true, canonical-pred)
    // rows — partition identity, which is the command's contract.
    def canon(lines: Seq[String]): Seq[(String, Int)] = {
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      lines.map { line =>
        val Array(t, p) = line.split(",").map(_.trim)
        (t, seen.getOrElseUpdate(p, seen.size))
      }
    }
    def readGolden(name: String): Seq[(String, Int)] =
      canon(scala.io.Source.fromFile(resource(name), "UTF-8").getLines().toSeq)
    def readPairs(dir: String): Seq[(String, Int)] = {
      // read the part files directly (readGolden-style): row order out
      // of spark.read.text across splits is not a contract, and canon's
      // first-occurrence ids depend on true line order
      val parts = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      canon(parts.toSeq.flatMap(f =>
        scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq))
    }

    val emb = resource("grinch_cli_embeddings.tsv")

    val outT = tmp("grinch_pairs_t06")
    Cli.run(spark, "grinch", Map(
      "input" -> emb, "output" -> outT, "threshold" -> "0.6",
      "pruning-strategy" -> "least_recent"))
    readPairs(outT) shouldBe readGolden("grinch_cli_pairs_t06.golden")

    val outA = tmp("grinch_pairs_auto")
    Cli.run(spark, "grinch", Map(
      "input" -> emb, "output" -> outA, "pruning-strategy" -> "least_recent"))
    readPairs(outA) shouldBe readGolden("grinch_cli_pairs_auto.golden")

    val outP = tmp("grinch_pairs_pruned")
    Cli.run(spark, "grinch", Map(
      "input" -> emb, "output" -> outP, "threshold" -> "0.6",
      "active-leaf-limit" -> "8"))
    readPairs(outP) shouldBe readGolden("grinch_cli_pairs_pruned.golden")
  }

  test("E3 workflow: grinch -> dendrogram-purity + cut-tree") {
    val emb = tmp("emb.tsv")
    // 4 one-hot-ish embeddings: two entities, written in the S7 format
    Files.writeString(java.nio.file.Paths.get(emb),
      """0	E1	1.0	0.0
        |1	E2	0.0	1.0
        |2	E1	0.9	0.1
        |3	E2	0.1	0.9
        |""".stripMargin)

    val tree = tmp("tree.tsv")
    Cli.run(spark, "grinch", Map("input" -> emb, "tree" -> tree))
    val purity = captureOut {
      Cli.run(spark, "dendrogram-purity", Map("dendrogram" -> tree))
    }
    purity.trim shouldBe "Dendrogram Purity: 1.0000"

    val cutOut = tmp("cut")
    Cli.run(spark, "cut-tree", Map(
      "dendrogram" -> tree, "embeddings" -> emb, "threshold" -> "0.5", "output" -> cutOut))
    val rows = spark.read.text(cutOut).collect().map(_.getString(0)).sorted
    rows should have size 4
    // E1 rows share a cluster id, E2 rows share a different one
    val byEntity = rows.map(_.split(", ")).groupBy(_.head).view.mapValues(_.map(_.last).toSet)
    byEntity("E1").size shouldBe 1
    byEntity("E2").size shouldBe 1
    byEntity("E1") should not be byEntity("E2")
  }

  test("E1 workflow: baseline blended clustering reaches F1 1.0 on separable mentions") {
    val mentions = tmp("bm")
    val rows = Seq(
      """{"mention": "aardvark", "left_context": "the big", "right_context": "ran", "entity_id": "A", "mention_index": 0}""",
      """{"mention": "zymurgy", "left_context": "art of", "right_context": "brewing", "entity_id": "B", "mention_index": 1}""",
      """{"mention": "aardvark", "left_context": "a small", "right_context": "slept", "entity_id": "A", "mention_index": 2}""",
      """{"mention": "zymurgy", "left_context": "study of", "right_context": "is fun", "entity_id": "B", "mention_index": 3}""")
    Files.createDirectories(java.nio.file.Paths.get(mentions))
    Files.writeString(java.nio.file.Paths.get(mentions + "/part.json"), rows.mkString("\n"))

    val pairs = tmp("bp")
    // same mention string -> mention-cosine 1; contexts differ, so the
    // blended score ~ 0.8 + 0.2·(small) for same-entity pairs; cross
    // pairs score near 0 -> threshold 0.6 separates
    Cli.run(spark, "baseline", Map("input" -> mentions, "output" -> pairs, "threshold" -> "0.6"))
    val report = captureOut {
      Cli.run(spark, "eval-clusters", Map("input" -> pairs))
    }
    report should include regex "muc_f1\\s+1\\.000000"
    report should include("n_pred_clusters 2")
  }

  test("combo blends fitted bigram similarity with provided embeddings") {
    val mentions = tmp("cm"); val embTsv = tmp("cemb.tsv"); val pairs = tmp("cp")
    val rows = Seq(
      """{"mention": "aardvark", "entity_id": "A", "mention_index": 0}""",
      """{"mention": "zymurgy", "entity_id": "B", "mention_index": 1}""",
      """{"mention": "aardvark", "entity_id": "A", "mention_index": 2}""",
      """{"mention": "zymurgy", "entity_id": "B", "mention_index": 3}""")
    Files.createDirectories(java.nio.file.Paths.get(mentions))
    Files.writeString(java.nio.file.Paths.get(mentions + "/part.json"), rows.mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(embTsv),
      """0	A	1.0	0.0
        |1	B	0.0	1.0
        |2	A	1.0	0.0
        |3	B	0.0	1.0
        |""".stripMargin)
    Cli.run(spark, "combo", Map(
      "input" -> mentions, "embeddings" -> embTsv, "output" -> pairs, "threshold" -> "0.6"))
    val report = captureOut {
      Cli.run(spark, "eval-clusters", Map("input" -> pairs))
    }
    report should include regex "muc_f1\\s+1\\.000000"
    report should include("n_pred_clusters 2")

    // bisection path: no --threshold, target = 2 entities
    val pairs2 = tmp("cp2")
    Cli.run(spark, "combo", Map(
      "input" -> mentions, "embeddings" -> embTsv, "output" -> pairs2))
    val report2 = captureOut {
      Cli.run(spark, "eval-clusters", Map("input" -> pairs2))
    }
    report2 should include("n_pred_clusters 2")
  }

  test("split-unseen routes by train-entity membership") {
    val train = tmp("tr"); val test = tmp("te")
    Files.createDirectories(java.nio.file.Paths.get(train))
    Files.createDirectories(java.nio.file.Paths.get(test))
    Files.writeString(java.nio.file.Paths.get(train + "/p.json"),
      """{"mention": "x", "entity_id": "A", "mention_index": 0}""")
    Files.writeString(java.nio.file.Paths.get(test + "/p.json"), Seq(
      """{"mention": "y", "entity_id": "A", "mention_index": 0}""",
      """{"mention": "z", "entity_id": "B", "mention_index": 1}""").mkString("\n"))
    val so = tmp("seen"); val uo = tmp("unseen")
    val outTxt = captureOut {
      Cli.run(spark, "split-unseen", Map(
        "train" -> train, "test" -> test, "seen-output" -> so, "unseen-output" -> uo))
    }
    spark.read.json(so).select("entity_id").collect().map(_.getString(0)).toSeq shouldBe Seq("A")
    spark.read.json(uo).select("entity_id").collect().map(_.getString(0)).toSeq shouldBe Seq("B")
    outTxt should include("1/2 (50.0%)")
  }

  test("string-match and oracle-wd and max-active commands") {
    val mentions = tmp("m")
    val rows = Seq(
      """{"mention": "apple", "entity_id": "A", "document_id": "d1", "mention_index": 0}""",
      """{"mention": "pear", "entity_id": "B", "document_id": "d1", "mention_index": 1}""",
      """{"mention": "apple", "entity_id": "A", "document_id": "d2", "mention_index": 2}""")
    Files.createDirectories(java.nio.file.Paths.get(mentions))
    Files.writeString(java.nio.file.Paths.get(mentions + "/part.json"), rows.mkString("\n"))

    val smOut = tmp("sm")
    Cli.run(spark, "string-match", Map("input" -> mentions, "output" -> smOut))
    spark.read.text(smOut).collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("0, 0", "0, 0", "1, 1")  // apple rows share cluster 0, pear is 1

    val owOut = tmp("ow")
    Cli.run(spark, "oracle-wd", Map("input" -> mentions, "output" -> owOut))
    spark.read.text(owOut).count() shouldBe 3

    val ma = captureOut {
      Cli.run(spark, "max-active", Map("input" -> mentions))
    }
    ma.trim shouldBe "Max active entities: 2"
  }

  test("error-analysis renders the worst conflated and split clusters as LaTeX rows") {
    val ds = tmp("ea-mentions"); val cl = tmp("ea-pairs")
    Files.createDirectories(java.nio.file.Paths.get(ds))
    Files.createDirectories(java.nio.file.Paths.get(cl))
    def m(i: Int, ent: String) =
      s"""{"left_context": "ctx_left of", "mention": "m$i", "right_context": "after words", """ +
        s""""entity_id": "$ent", "mention_index": $i}"""
    Files.writeString(java.nio.file.Paths.get(ds + "/p.json"), Seq(
      m(0, "Ent_A"), m(1, "Ent_B"), m(2, "Ent_B"),
      m(3, "Ent_B"), m(4, "Ent_B"), m(5, "Ent_C")).mkString("\n"))
    // pred 1 conflates A+B (conflated=1); true B scatters over preds
    // 1,2,3 (divided=2)
    Files.writeString(java.nio.file.Paths.get(cl + "/pairs.txt"), Seq(
      "A, 1", "B, 1", "B, 1", "B, 2", "B, 3", "C, 4").mkString("\n"))
    val out = captureOut {
      Cli.run(spark, "error-analysis", Map("dataset" -> ds, "clusters" -> cl))
    }
    out should include("Num Entities: 3")
    out should include("Conflated Entities: 1")
    out should include("Split Entities: 2")
    out should include("Most Split")
    out should include("Most Conflated")
    // escaped contexts + \emph'd mention (P5), reference layout
    out should include("""\ldots ctx\_left of \emph{m1} after words \ldots""")
    // one row per distinct entity, underscores to spaces, ' & ' join,
    // trailing ' \\' (error_analysis.py:112-126)
    out should include("""Ent A & \ldots ctx\_left of \emph{m0} after words \ldots \\""")
    out should include("""Ent B & \ldots ctx\_left of \emph{m1} after words \ldots \\""")
    // dedup: only TWO conflated rows despite three cluster members
    out.linesIterator.count(_.endsWith("""\\""")) shouldBe 2
    // GOLDEN: the reference's error_analysis.py executed on this exact
    // fixture (scipy stubbed) prints precisely this stdout — section
    // headers, row order, escapes, and the blank separator line
    val golden =
      """Most Split
        |\ldots ctx\_left of \emph{m1} after words \ldots
        |\ldots ctx\_left of \emph{m2} after words \ldots
        |\ldots ctx\_left of \emph{m3} after words \ldots
        |\ldots ctx\_left of \emph{m4} after words \ldots
        |
        |Most Conflated
        |Ent A & \ldots ctx\_left of \emph{m0} after words \ldots \\
        |Ent B & \ldots ctx\_left of \emph{m1} after words \ldots \\""".stripMargin
    out should include(golden)
  }

  test("eval-clusters --choice seen/unseen filters mentions before scoring") {
    val train = tmp("ec-train"); val test = tmp("ec-test"); val pairs = tmp("ec-pairs")
    Seq(train, test, pairs).foreach(p => Files.createDirectories(java.nio.file.Paths.get(p)))
    Files.writeString(java.nio.file.Paths.get(train + "/p.json"),
      """{"mention": "x", "entity_id": "E0", "mention_index": 0}""")
    // line number = mid, matching the pairs file line-for-line
    Files.writeString(java.nio.file.Paths.get(test + "/p.json"), Seq(
      """{"mention": "a", "entity_id": "E0", "mention_index": 10}""",
      """{"mention": "b", "entity_id": "E0", "mention_index": 11}""",
      """{"mention": "c", "entity_id": "E9", "mention_index": 12}""",
      """{"mention": "d", "entity_id": "E9", "mention_index": 13}""").mkString("\n"))
    // seen rows perfectly clustered; unseen rows split across preds
    Files.writeString(java.nio.file.Paths.get(pairs + "/pairs.txt"), Seq(
      "E0, 0", "E0, 0", "E9, 1", "E9, 2").mkString("\n"))
    def meanF1(flags: Map[String, String]): Double = {
      val out = captureOut(Cli.run(spark, "eval-clusters", flags))
      """mean_f1\s+([0-9.]+)""".r.findFirstMatchIn(out).get.group(1).toDouble
    }
    val base = Map("input" -> pairs, "train" -> train, "test" -> test)
    val all = meanF1(Map("input" -> pairs))
    val seen = meanF1(base + ("choice" -> "seen"))
    val unseen = meanF1(base + ("choice" -> "unseen"))
    seen shouldBe 1.0 +- 1e-9
    unseen should be < 1.0
    all should not be seen
  }

  test("dendrogram-purity --medmentions --cluster-by matches the reference-executed values") {
    // Goldens from executing /root/reference/meercat/dendrogram_purity.py
    // on these exact files: -c semantic_type -> " 0.5833",
    // -c entity_id -> " 0.6667". Leaf uids are the reference's
    // "<pmid>_<mentionIndex>" mention keys; tree leaves carry no label,
    // so the metadata join supplies every histogram entry
    // (`dendrogram_purity.py:34-45,86-96`).
    val pub = tmp("purity.pubtator")
    Files.writeString(java.nio.file.Paths.get(pub),
      "100|t|Alpha title\n100|a|Alpha abstract\n" +
        "100\t0\t5\talpha\tT01,T99\tC001\n" +
        "100\t6\t11\tbeta\tT02\tC002\n" +
        "100\t12\t17\tgamma\tT01\tC001\n\n" +
        "101|t|Beta title\n101|a|Beta abstract\n" +
        "101\t0\t5\tdelta\tT02\tC002\n" +
        "101\t6\t11\tepsil\tT01\tC003\n" +
        "101\t12\t17\tzeta\tT03\tC003\n\n")
    val tree = tmp("purity-tree.tsv")
    Files.writeString(java.nio.file.Paths.get(tree), Seq(
      "r\tNone\tNone",
      "i2\tr\tNone",
      "i4\tr\tNone",
      "i1\ti2\tNone",
      "101_0\ti2\tNone",
      "i3\ti4\tNone",
      "101_2\ti4\tNone",
      "100_0\ti1\tNone",
      "100_2\ti1\tNone",
      "100_1\ti3\tNone",
      "101_1\ti3\tNone").mkString("\n") + "\n")
    def purity(clusterBy: String): String = captureOut {
      Cli.run(spark, "dendrogram-purity", Map(
        "dendrogram" -> tree, "medmentions" -> pub, "cluster-by" -> clusterBy))
    }.trim
    purity("semantic_type") shouldBe "Dendrogram Purity: 0.5833"
    purity("entity_id") shouldBe "Dendrogram Purity: 0.6667"
    // flag hygiene mirrors eval-clusters: half-given metadata flags fail fast
    an[IllegalArgumentException] should be thrownBy
      Cli.run(spark, "dendrogram-purity", Map("dendrogram" -> tree, "medmentions" -> pub))
    an[IllegalArgumentException] should be thrownBy
      Cli.run(spark, "dendrogram-purity", Map(
        "dendrogram" -> tree, "medmentions" -> pub, "cluster-by" -> "nope"))
  }
}
