package graft

import org.apache.spark.sql.functions._

import graft.operators.Projections
import graft.sources.Sources

/** Source/parser queries (SURVEY §2.1 S2/S3/S5/S6 + §2.2 P1/P2) run over
  * embedded format fixtures (FIXTURES.md shapes) — the parsers are the
  * operators under test; the DuckDB oracles are VALUES literals of the
  * expected relational output, so the driver hash-checks the parse.
  */
object QueriesSources {
  import QueriesRelational.Q

  // ---------------------------------------------------------------- s2
  val pubTatorFixture: String =
    """1234|t|Title 1
      |1234|a|Abstract 1
      |1234	0	1	T	T1,T2	C00
      |1234	2	3	t	T3	C01
      |
      |5678|t|Second doc
      |5678|a|More text here
      |5678	0	6	Second	T9	C02""".stripMargin

  val s2PubTator: Q = (s, _) => {
    import s.implicits._
    Sources.pubTatorFromString(s, pubTatorFixture)
      .flatMap(d => d.mentions.map(m =>
        (d.pmid, d.title, m.start.toLong, m.end.toLong, m.text,
          m.semanticTypes.mkString(","), m.entityId)))
      .toDF("pmid", "title", "m_start", "m_end", "m_text", "types_csv", "entity_id")
      .orderBy("pmid", "m_start")
  }

  val s2PubTatorSql: String =
    """SELECT * FROM (VALUES
      |  ('1234', 'Title 1', 0::BIGINT, 1::BIGINT, 'T', 'T1,T2', 'C00'),
      |  ('1234', 'Title 1', 2::BIGINT, 3::BIGINT, 't', 'T3', 'C01'),
      |  ('5678', 'Second doc', 0::BIGINT, 6::BIGINT, 'Second', 'T9', 'C02'))
      |AS t(pmid, title, m_start, m_end, m_text, types_csv, entity_id)
      |ORDER BY pmid, m_start""".stripMargin

  // ---------------------------------------------------------------- s3
  val aidaFixture: String =
    """-DOCSTART- (1 EU)
      |EU	B	EU	European_Union
      |rejects
      |German	B	German	Germany
      |call
      |to
      |boycott""".stripMargin

  val s3Aida: Q = (s, _) => {
    import s.implicits._
    Sources.aidaFromString(s, aidaFixture)
      .flatMap(d => d.mentions.map(m =>
        (d.docId, d.text.substring(m.start, m.end), m.entityId, m.start.toLong, m.end.toLong)))
      .toDF("document_id", "mention", "entity_id", "m_start", "m_end")
      .orderBy("m_start")
  }

  // text = "EU rejects German call toboycott" (the reference glues the
  // last two tokens — preprocess_aida_yago2.py:45-46)
  val s3AidaSql: String =
    """SELECT * FROM (VALUES
      |  ('1 EU', 'EU', 'European_Union', 0::BIGINT, 2::BIGINT),
      |  ('1 EU', 'German', 'Germany', 11::BIGINT, 17::BIGINT))
      |AS t(document_id, mention, entity_id, m_start, m_end)
      |ORDER BY m_start""".stripMargin

  // ---------------------------------------------------------------- s5
  val ecbFixture: String =
    """<Document doc_name="1_1ecb.xml">
      |<token t_id="1" sentence="0" number="0">The</token>
      |<token t_id="2" sentence="0" number="1">big</token>
      |<token t_id="3" sentence="0" number="2">dog</token>
      |<token t_id="4" sentence="1" number="0">barked</token>
      |<Markables>
      |<HUMAN_PART m_id="1"><token_anchor t_id="2"/><token_anchor t_id="3"/></HUMAN_PART>
      |<ACTION_OCCURRENCE m_id="2"><token_anchor t_id="4"/></ACTION_OCCURRENCE>
      |<NEG_THING m_id="3"><token_anchor t_id="1"/></NEG_THING>
      |</Markables>
      |<Relations>
      |<CROSS_DOC_COREF r_id="r1"><source m_id="1"/><source m_id="2"/><source m_id="3"/></CROSS_DOC_COREF>
      |</Relations>
      |</Document>""".stripMargin

  val s5EcbPlus: Q = (s, _) => {
    import s.implicits._
    Sources.ecbPlusFromString(s, ecbFixture)
      .map(m => (m.leftContext, m.mention, m.rightContext, m.entityId))
      .toDF("left_context", "mention", "right_context", "entity_id")
      .orderBy("mention")
  }

  // ACT/NEG markables (m2, m3) are filtered; only m1 survives.
  val s5EcbPlusSql: String =
    """SELECT * FROM (VALUES
      |  ('The', 'big dog', 'barked', 'r1'))
      |AS t(left_context, mention, right_context, entity_id)
      |ORDER BY mention""".stripMargin

  // ---------------------------------------------------------------- s6
  val kiltFixture: Seq[String] = Seq(
    """{"meta": {"left_context": "I am a", "mention": "banana", "right_context": "!"}, "output": [{"answer": "Q42"}]}""",
    """{"meta": {"left_context": "the", "mention": "cat", "right_context": "sat"}, "output": [{"answer": "Q1"}]}""")

  val s6Kilt: Q = (s, _) => {
    import s.implicits._
    Sources.projectKilt(s.read.json(s.createDataset(kiltFixture)))
      .orderBy("entity_id")
  }

  val s6KiltSql: String =
    """SELECT * FROM (VALUES
      |  ('the', 'cat', 'sat', 'Q1'),
      |  ('I am a', 'banana', '!', 'Q42'))
      |AS t(left_context, mention, right_context, entity_id)
      |ORDER BY entity_id""".stripMargin

  // ---------------------------------------------------------------- p1
  // Document→mention flatten on an inline document relation.
  val p1Flatten: Q = (s, _) => {
    import s.implicits._
    val docs = Seq(("d1", "hello world", Seq((0, 5), (6, 11)))).toDF("doc_id", "text", "spans")
      .select(col("doc_id"), col("text"),
        expr("transform(spans, x -> named_struct('start', x._1, 'end', x._2))").as("mentions"))
    Projections.flattenDocument(docs, col("text"), col("mentions"))
      .select(col("doc_id"), col("left_context"), col("mention"), col("right_context"))
      .orderBy("mention")
  }

  val p1FlattenSql: String =
    """SELECT * FROM (VALUES
      |  ('d1', '', 'hello', ' world'),
      |  ('d1', 'hello ', 'world', ''))
      |AS t(doc_id, left_context, mention, right_context)
      |ORDER BY mention""".stripMargin

  // ---------------------------------------------------------------- p2
  // Context windowing with slack redistribution: left 5 tokens, right 1,
  // budget 10 ⇒ context 5, halves 2/2, right is short so left gets 3.
  val p2ContextWindow: Q = (s, _) => {
    import s.implicits._
    val df = Seq((Seq("l1", "l2", "l3", "l4", "l5"), Seq("m"), Seq("r1")))
      .toDF("left", "mention", "right")
    val (lk, rk) = Projections.contextWindow(col("left"), col("mention"), col("right"), 10)
    df.select(concat_ws(" ", lk).as("left_kept"), concat_ws(" ", rk).as("right_kept"))
  }

  val p2ContextWindowSql: String =
    """SELECT * FROM (VALUES ('l3 l4 l5', 'r1')) AS t(left_kept, right_kept)""".stripMargin

  // ---------------------------------------------------------------- s4
  // Zeshel two-file reader = the J1 equi-join (context + label docs).
  val s4Zeshel: Q = (s, _) => {
    import s.implicits._
    val docs = Seq(
      ("d1", "Alpha", "Alpha is a greek letter", "letters"),
      ("d2", "Beta", "Beta follows alpha closely", "letters2"))
      .toDF("document_id", "title", "text", "category")
    val mentions = Seq(("d1", "d2", 3, 4))
      .toDF("context_document_id", "label_document_id", "start_index", "end_index")
    Sources.zeshelMentions(docs, mentions)
      .select(col("mention_index").cast("long").as("mention_index"),
        col("left_context"), col("mention"), col("right_context"),
        col("entity_id"), col("category"), col("document_id"))
      .orderBy("mention_index")
  }

  val s4ZeshelSql: String =
    """SELECT * FROM (VALUES
      |  (0::BIGINT, 'Alpha is a', 'greek letter', '', 'Beta', 'letters', 'd1'),
      |  (1::BIGINT, '', 'Beta', 'follows alpha closely', 'Beta', 'letters2', 'd2'))
      |AS t(mention_index, left_context, mention, right_context, entity_id, category, document_id)
      |ORDER BY mention_index""".stripMargin

  // ------------------------------------------------- s1/s7/s9/s10/s11
  // File-contract ROUNDTRIPS: each writes through the reference's file
  // format and reads it back, and the oracle recomputes the expected
  // relation from the parquet tables (or VALUES) directly — so the
  // driver hash-checks the format encoding itself (float shortest-
  // decimal, [PAD] prepend, 'None' null encoding, dd/MM/yyyy dates).

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/out"

  // S1: mention JSONL write → schema'd read, incl. the date parse.
  val s1MentionsJsonl: Q = (s, dir) => {
    val out = tmpDir("s1")
    Tables.load(s, dir, "documents")
      .select(
        lit("").as("left_context"), col("text").as("mention"),
        lit("").as("right_context"), col("lang").as("entity_id"),
        array(col("source")).as("type"),
        col("doc_id").cast("string").as("document_id"),
        col("doc_id").cast("long").as("document_index"),
        col("doc_id").cast("long").as("mention_index"),
        lit("15/03/2021").as("date"))
      .write.mode("overwrite").json(out)
    Sources.readMentionsJsonl(s, out)
      .select(col("document_id"), col("entity_id"),
        element_at(col("type"), 1).as("type0"),
        col("mention_index"), col("date").cast("string").as("date"))
      .orderBy("mention_index")
  }

  val s1MentionsJsonlSql: String =
    """SELECT cast(doc_id AS VARCHAR) AS document_id, lang AS entity_id,
      |       source AS type0, doc_id AS mention_index, '2021-03-15' AS date
      |FROM documents ORDER BY mention_index""".stripMargin

  // S7/S8: embedding TSV write → read, full-vector compare.
  val s7EmbeddingTsv: Q = (s, dir) => {
    val out = tmpDir("s7")
    Sources.writeEmbeddingsTsv(
      Tables.load(s, dir, "embeddings").where(col("vec_id") < 100)
        .select(col("vec_id"), col("label").cast("string").as("entity"), col("embedding")),
      "vec_id", "entity", "embedding", 64, out)
    Sources.readEmbeddingsTsv(s, out)
      .select(col("uid").as("vec_id"), col("entity_id"),
        posexplode(col("embedding")).as(Seq("idx", "val")))
      .select(col("vec_id"), col("entity_id"), col("idx").cast("long").as("idx"), col("val"))
      .orderBy("vec_id", "idx")
  }

  val s7EmbeddingTsvSql: String =
    """SELECT vec_id, cast(label AS VARCHAR) AS entity_id, i - 1 AS idx,
      |       embedding[i]::FLOAT AS val
      |FROM embeddings, generate_series(1, 64) AS t(i)
      |WHERE vec_id < 100 ORDER BY vec_id, idx""".stripMargin

  // S9: vocab CSV write ([PAD] prepend) → read.
  val s9VocabCsv: Q = (s, dir) => {
    val out = tmpDir("s9")
    Sources.writeVocabCsv(
      graft.operators.Relational.frequencyVocab(
        Tables.load(s, dir, "events"), col("user_id")), out)
    Sources.readVocabCsv(s, out).orderBy("entity", "cnt")
  }

  val s9VocabCsvSql: String =
    """SELECT entity, cnt FROM (
      |  SELECT '[PAD]' AS entity, 0::BIGINT AS cnt
      |  UNION ALL
      |  SELECT cast(user_id AS VARCHAR), cast(count(*) AS BIGINT) FROM events GROUP BY user_id)
      |ORDER BY entity, cnt""".stripMargin

  // S10: cluster-pairs CSV write → read.
  val s10PairsCsv: Q = (s, dir) => {
    val out = tmpDir("s10")
    Sources.writeClusterPairs(
      Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
      "lang", "source", "doc_id", out)
    Sources.readClusterPairs(s, out).orderBy("true_id", "pred_id")
  }

  val s10PairsCsvSql: String =
    """SELECT lang AS true_id, source AS pred_id FROM documents
      |ORDER BY true_id, pred_id""".stripMargin

  // S11: dendrogram TSV roundtrip on a fixture tree — pins the 'None'
  // null encoding for parent/label on both directions.
  val s11DendrogramTsv: Q = (s, _) => {
    import s.implicits._
    val out = tmpDir("s11")
    val tree = Seq(
      ("4", null, null), ("3", "4", null),
      ("0", "3", "x"), ("1", "3", "y"), ("2", "4", "x"))
      .toDF("uid", "parent_uid", "label")
    Sources.writeDendrogramTsv(tree, out)
    Sources.readDendrogramTsv(s, out).orderBy("uid")
  }

  val s11DendrogramTsvSql: String =
    """SELECT * FROM (VALUES
      |  ('0', '3', 'x'), ('1', '3', 'y'), ('2', '4', 'x'),
      |  ('3', '4', NULL), ('4', NULL, NULL))
      |AS t(uid, parent_uid, label) ORDER BY uid""".stripMargin

  val queries: Map[String, Q] = Map(
    "s2_pubtator" -> s2PubTator,
    "s3_aida" -> s3Aida,
    "s4_zeshel" -> s4Zeshel,
    "s5_ecbplus" -> s5EcbPlus,
    "s6_kilt" -> s6Kilt,
    "s1_mentions_jsonl" -> s1MentionsJsonl,
    "s7_embedding_tsv" -> s7EmbeddingTsv,
    "s9_vocab_csv" -> s9VocabCsv,
    "s10_pairs_csv" -> s10PairsCsv,
    "s11_dendrogram_tsv" -> s11DendrogramTsv,
    "p1_flatten" -> p1Flatten,
    "p2_context_window" -> p2ContextWindow)

  val oracles: Map[String, String] = Map(
    "s2_pubtator" -> s2PubTatorSql,
    "s3_aida" -> s3AidaSql,
    "s4_zeshel" -> s4ZeshelSql,
    "s5_ecbplus" -> s5EcbPlusSql,
    "s6_kilt" -> s6KiltSql,
    "s1_mentions_jsonl" -> s1MentionsJsonlSql,
    "s7_embedding_tsv" -> s7EmbeddingTsvSql,
    "s9_vocab_csv" -> s9VocabCsvSql,
    "s10_pairs_csv" -> s10PairsCsvSql,
    "s11_dendrogram_tsv" -> s11DendrogramTsvSql,
    "p1_flatten" -> p1FlattenSql,
    "p2_context_window" -> p2ContextWindowSql)
}
