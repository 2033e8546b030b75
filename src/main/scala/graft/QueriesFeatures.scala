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
  // F1 char-bigram TF: vocab (CountVectorizer's top-by-total-tf rule)
  // + per-doc TF + L2 weights, all as one DataFrame aggregation — the
  // compiled-TermCounts fast path; the spark.ml Pipeline stays as the
  // F3 persistence wrapper (FeatureSpec pins relation parity). The RDD
  // fit was the catalog's single largest batch cost (71 s at sf1).
  val x1CharBigramTf: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    FeaturePipelines.charBigramTfRelation(docs, "doc_id", "text")
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

  // --------------------------------------------------------------- x1b
  // F1's vocab TRUNCATION rule, oracle-checked: vocabSize=50 < the 114
  // distinct corpus bigrams, so the top-K-by-total-tf selection (ties
  // broken term-asc — deterministic on both engines, unlike the RDD
  // fit's partition-dependent tie order) actually filters. Weights
  // still normalize over each doc's FULL term set, the same semantics
  // as the fitted-model relation.
  private val X1bVocab = 50

  val x1bVocabTopK: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    FeaturePipelines.charBigramTfRelation(docs, "doc_id", "text", vocabSize = X1bVocab)
      .orderBy("doc_id", "term")
  }

  val x1bVocabTopKSql: String =
    s"""WITH bg AS (
       |  SELECT doc_id, unnest(CASE WHEN length(text) < 2 THEN []::VARCHAR[]
       |    ELSE list_transform(generate_series(1, length(text)-1), i -> substring(text, i, 2)) END) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM bg GROUP BY 1, 2),
       |v AS (SELECT term FROM (SELECT term, cast(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY term)
       |      ORDER BY cnt DESC, term LIMIT $X1bVocab),
       |nrm AS (SELECT doc_id, sqrt(cast(sum(tf*tf) as double)) AS nrm FROM tf GROUP BY doc_id)
       |SELECT doc_id, term, tf, cast(tf as double)/nrm AS weight
       |FROM tf JOIN nrm USING (doc_id) JOIN v USING (term)
       |ORDER BY doc_id, term""".stripMargin

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
  // Multimodal feature extraction over an inline binary fixture. The
  // decode STUB is a deterministic mod-p byte hash, so the oracle can
  // recompute it from the same ASCII literals — the batched plumbing
  // (binary columns, mapPartitions, per-partition init) is the real
  // subject; a production decoder swaps in at the same signature.
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

  // ---------------------------------------------------------------- m3
  // Metadata-level media resize: aspect-preserving integer-floor target
  // dims, pure double arithmetic — oracle recomputes from the same
  // literal dims.
  val m3ResizeMeta: Q = (s, _) => {
    import s.implicits._
    val media = Seq((0L, 4000, 3000), (1L, 800, 600), (2L, 100, 2000))
      .toDF("id", "width", "height")
    Multimodal.resizeMeta(media, maxSide = 1024)
      .select(col("id"), col("width"), col("height"),
        col("out_width"), col("out_height"))
      .orderBy("id")
  }

  val m3ResizeMetaSql: String =
    """WITH media(id, width, height) AS (VALUES
      |  (0::BIGINT, 4000, 3000), (1, 800, 600), (2, 100, 2000)),
      |s AS (SELECT *, least(1.0::DOUBLE, 1024.0 / greatest(width, height)) AS sc FROM media)
      |SELECT id, width, height,
      |       cast(floor(width * sc) AS INTEGER) AS out_width,
      |       cast(floor(height * sc) AS INTEGER) AS out_height
      |FROM s ORDER BY id""".stripMargin

  val m1MultimodalFeaturesSql: String = {
    val P = graft.functions.TextFunctions.P
    s"""WITH media(id, s) AS (VALUES
       |  (0, 'fake-jpeg-bytes-aaaa'), (1, 'fake-wav-bytes-bbbbbb'), (2, 'fake-mp4-bytes-cc')),
       |h AS (
       |  SELECT id, list_reduce(list_prepend(1::BIGINT,
       |    list_transform(generate_series(1, length(s)),
       |      ci -> ascii(substring(s, ci, 1))::BIGINT)),
       |    (acc, x) -> (acc*31 + x) % $P) AS h0
       |  FROM media)
       |SELECT id::BIGINT AS id, 4 AS feat_dim,
       |       (cast(h0 AS DOUBLE) / $P)::FLOAT::DOUBLE AS f0
       |FROM h ORDER BY id""".stripMargin
  }

  // expected chunking of the 32- and 17-byte fixtures at frameBytes=4,
  // stride=2 — pins the demux-stub plumbing (grouped + every-2nd frame,
  // short final chunk kept)
  val m2FrameSampleSql: String =
    """SELECT * FROM (VALUES
      |  (0::BIGINT, 0::BIGINT, 4::BIGINT), (0, 2, 4), (0, 4, 4), (0, 6, 4),
      |  (1, 0, 4), (1, 2, 4), (1, 4, 1)) AS t(id, frame_idx, frame_len)
      |ORDER BY id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- f4
  // The embedding plug-in boundary's deterministic toy encoder: hashing
  // projection of token hashes to a dense vector (dim 8), exploded.
  val f4HashEmbed: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.hashEmbed(
          graft.functions.TextFunctions.tokens(col("text")), 8)).as(Seq("idx", "val")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"), col("val"))
      .orderBy("doc_id", "idx")

  val f4HashEmbedSql: String = {
    val P = graft.functions.TextFunctions.P
    val strHash = "list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, length(t)), " +
      s"ci -> ascii(substring(t, ci, 1))::BIGINT)), (acc, x) -> (acc*31 + x) % $P)"
    s"""WITH th AS (
       |  SELECT doc_id,
       |         list_transform(string_split(text, ' '), t -> $strHash) AS th,
       |         len(string_split(text, ' ')) AS n
       |  FROM documents)
       |SELECT doc_id, k::BIGINT AS idx,
       |       (cast(list_reduce(list_prepend(0::BIGINT,
       |          list_transform(th, h -> ((h + k + 42) * 2654435761) % $P - ${P / 2})),
       |          (a, x) -> a + x) as double)
       |        / cast(n as double) / ${P / 2}.0)::FLOAT AS val
       |FROM th, generate_series(0, 7) AS t(k)
       |ORDER BY doc_id, idx""".stripMargin
  }

  // ---------------------------------------------------------------- a13
  // Triplet sampler over the events table (user_id buckets). Both the
  // row-rank hash (Knuth multiplicative mix of event_id) and the
  // negative-entity pick (PolyHash of the entity string) are mod-p
  // integer arithmetic, so the whole selection is oracle-reproducible.
  val a13Triplets: Q = (s, dir) =>
    graft.operators.Sampling.tripletSample(
      Tables.load(s, dir, "events").where(col("user_id") < 20),
      col("user_id"), col("event_id"))
      .orderBy("entity")

  val a13TripletsSql: String = {
    val P = graft.functions.TextFunctions.P
    s"""WITH base AS (
       |  SELECT user_id AS e, event_id AS rid FROM events WHERE user_id < 20),
       |ranked AS (
       |  SELECT e, rid,
       |         row_number() OVER (PARTITION BY e
       |           ORDER BY ((((rid % $P) * 2654435761 + 42) % $P + $P) % $P), rid) AS rk,
       |         count(*) OVER (PARTITION BY e) AS bucket_size
       |  FROM base),
       |pos AS (
       |  SELECT e,
       |         min(CASE WHEN rk = 1 THEN rid END) AS pos_1,
       |         min(CASE WHEN rk = 2 THEN rid END) AS pos_2
       |  FROM ranked WHERE bucket_size >= 2 AND rk <= 2 GROUP BY e),
       |es AS (SELECT DISTINCT e, cast(e AS VARCHAR) AS s FROM ranked),
       |ents AS (
       |  SELECT e AS ne,
       |         (list_reduce(list_prepend(0::BIGINT,
       |            list_transform(generate_series(1, length(s)),
       |              ci -> ascii(substring(s, ci, 1))::BIGINT)),
       |            (acc, x) -> (acc*31 + x) % $P) + 42) % $P AS eh
       |  FROM es),
       |negpick AS (
       |  SELECT e, ne FROM (
       |    SELECT p.e, t.ne,
       |           row_number() OVER (PARTITION BY p.e ORDER BY t.eh, t.ne) AS rk
       |    FROM pos p JOIN ents t ON p.e <> t.ne)
       |  WHERE rk = 1),
       |negrow AS (SELECT e AS ne, rid AS neg FROM ranked WHERE rk = 1)
       |SELECT p.e AS entity, p.pos_1, p.pos_2, n.ne AS neg_entity, r.neg
       |FROM pos p JOIN negpick n USING (e) JOIN negrow r ON n.ne = r.ne
       |ORDER BY entity""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "x1_char_bigram_tf" -> x1CharBigramTf,
    "x1b_vocab_topk" -> x1bVocabTopK,
    "x2_word_df" -> x2WordDf,
    "f4_hash_embed" -> f4HashEmbed,
    "a13_triplets" -> a13Triplets,
    "m1_multimodal_features" -> m1MultimodalFeatures,
    "m2_frame_sample" -> m2FrameSample,
    "m3_resize_meta" -> m3ResizeMeta)

  val oracles: Map[String, String] = Map(
    "x1_char_bigram_tf" -> x1CharBigramTfSql,
    "x1b_vocab_topk" -> x1bVocabTopKSql,
    "x2_word_df" -> x2WordDfSql,
    "f4_hash_embed" -> f4HashEmbedSql,
    "a13_triplets" -> a13TripletsSql,
    "m1_multimodal_features" -> m1MultimodalFeaturesSql,
    "m2_frame_sample" -> m2FrameSampleSql,
    "m3_resize_meta" -> m3ResizeMetaSql)
}
