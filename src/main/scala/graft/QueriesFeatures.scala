package graft

import org.apache.spark.sql.functions._

import graft.operators.{FeaturePipelines, Multimodal}

/** F1-F3 vectorizer queries (relational projections of the fitted
  * spark.ml pipelines, oracle-checked on exact counts) and the
  * multimodal plumbing queries (rows-only — the decode step is a
  * deterministic stub).
  */
object QueriesFeatures {
  import QueriesRelational.Q

  // ---------------------------------------------------------------- x1
  // F1 char-bigram TF: fitted CountVectorizer vocab + per-doc TF,
  // L2-normalized weights — exploded back to a relation.
  val x1CharBigramTf: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val model = FeaturePipelines.charBigramTf("text", "features").fit(docs)
    FeaturePipelines.charBigramRelation(model, docs, "doc_id")
      .select(col("doc_id"), col("term"), col("tf"), col("weight"))
      .orderBy("doc_id", "term")
  }

  val x1CharBigramTfSql: String =
    """WITH bg AS (
      |  SELECT doc_id, unnest(CASE WHEN length(text) < 2 THEN []::VARCHAR[]
      |    ELSE list_transform(generate_series(1, length(text)-1), i -> substring(text, i, 2)) END) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM bg GROUP BY 1, 2),
      |nrm AS (SELECT doc_id, sqrt(cast(sum(tf*tf) as double)) AS nrm FROM tf GROUP BY doc_id)
      |SELECT doc_id, term, tf, cast(tf as double)/nrm AS weight
      |FROM tf JOIN nrm USING (doc_id) ORDER BY doc_id, term""".stripMargin

  // ---------------------------------------------------------------- x2
  // F2 word TF-IDF: the fitted IDF model's document frequencies
  // (exact integers; the float idf weights are engine-internal).
  val x2WordDf: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val model = FeaturePipelines.wordTfIdf("text", "features").fit(docs)
    FeaturePipelines.docFreqRelation(model, s).orderBy("term")
  }

  val x2WordDfSql: String =
    """SELECT term, count(*) AS df FROM (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |GROUP BY term ORDER BY term""".stripMargin

  // ---------------------------------------------------------------- m1
  // Multimodal feature extraction over an inline binary fixture
  // (rows-only: the decode is a stub; the batched plumbing is real).
  val m1MultimodalFeatures: Q = (s, _) => {
    import s.implicits._
    val media = Seq(
      (0L, "fake-jpeg-bytes-aaaa".getBytes("UTF-8"), "jpeg", 640, 480),
      (1L, "fake-wav-bytes-bbbbbb".getBytes("UTF-8"), "wav", 0, 0),
      (2L, "fake-mp4-bytes-cc".getBytes("UTF-8"), "mp4", 1920, 1080))
      .toDF("id", "content", "format", "width", "height")
    Multimodal.extractFeatures(media, dim = 4)
      .select(col("id"), col("featDim").as("feat_dim"),
        element_at(col("features"), 1).cast("double").as("f0"))
      .orderBy("id")
  }

  // ---------------------------------------------------------------- m2
  // Video frame sampling plumbing (stub demuxer: fixed-size chunks).
  val m2FrameSample: Q = (s, _) => {
    import s.implicits._
    val media = Seq(
      (0L, Array.tabulate(32)(_.toByte)),
      (1L, Array.tabulate(17)(_.toByte)))
      .toDF("id", "content")
    Multimodal.sampleFrames(media, frameBytes = 4, stride = 2)
      .select(col("id"), col("frame_idx"), length(col("frame")).cast("long").as("frame_len"))
      .orderBy("id", "frame_idx")
  }

  val queries: Map[String, Q] = Map(
    "x1_char_bigram_tf" -> x1CharBigramTf,
    "x2_word_df" -> x2WordDf,
    "m1_multimodal_features" -> m1MultimodalFeatures,
    "m2_frame_sample" -> m2FrameSample)

  val oracles: Map[String, String] = Map(
    "x1_char_bigram_tf" -> x1CharBigramTfSql,
    "x2_word_df" -> x2WordDfSql)
}
