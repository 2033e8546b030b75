package graft.operators

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, IDFModel, Normalizer, SQLTransformer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F1-F3 — the reference's fitted text vectorizers
  * (`/root/reference/meercat/fit_vectorizer.py:12-31`) as spark.ml
  * pipelines:
  *  - F1: char-bigram term-frequency, L2-normalized
  *    (TfidfVectorizer(analyzer='char', ngram_range=(2,2), use_idf=False))
  *  - F2: word TF-IDF capped at 10k features
  *    (TfidfVectorizer(max_features=10000))
  *  - F3: persistence via Pipeline.save/load (the reference pickles).
  *
  * Fitting is a distributed aggregation (CountVectorizer builds the
  * vocab with a hash agg + top-k); transform is a per-row map — both
  * scale linearly. The bigram/token expansion is a SQLTransformer so
  * the whole pipeline serializes.
  */
object FeaturePipelines {

  /** Character-bigram extraction as a SQL expression (empty/1-char
    * strings yield an empty array — avoids Spark's descending
    * sequence(1,0)).
    */
  def charBigramSql(inputCol: String): String =
    s"CASE WHEN length($inputCol) < 2 THEN array() " +
      s"ELSE transform(sequence(1, length($inputCol) - 1), i -> substring($inputCol, i, 2)) END"

  /** F1 — char-bigram TF pipeline: input string column → L2-normalized
    * sparse TF vector in `outputCol`.
    */
  def charBigramTf(inputCol: String, outputCol: String, vocabSize: Int = 1 << 18): Pipeline = {
    val bigrams = new SQLTransformer()
      .setStatement(s"SELECT *, ${charBigramSql(inputCol)} AS __bigrams FROM __THIS__")
    val cv = new CountVectorizer()
      .setInputCol("__bigrams").setOutputCol("__tf").setVocabSize(vocabSize)
    val norm = new Normalizer().setInputCol("__tf").setOutputCol(outputCol).setP(2.0)
    new Pipeline().setStages(Array(bigrams, cv, norm))
  }

  /** F2 — word TF-IDF pipeline (whitespace tokens, 10k-feature cap). */
  def wordTfIdf(inputCol: String, outputCol: String, vocabSize: Int = 10000): Pipeline = {
    val toks = new SQLTransformer()
      .setStatement(s"SELECT *, split($inputCol, ' ') AS __toks FROM __THIS__")
    val cv = new CountVectorizer()
      .setInputCol("__toks").setOutputCol("__tf").setVocabSize(vocabSize)
    val idf = new IDF().setInputCol("__tf").setOutputCol("__tfidf")
    val norm = new Normalizer().setInputCol("__tfidf").setOutputCol(outputCol).setP(2.0)
    new Pipeline().setStages(Array(toks, cv, idf, norm))
  }

  /** Explode a fitted F1 transform back to a relation
    * (id, term, weight) — weight = tf/‖tf‖₂ per row. Used by the
    * oracle-checked query form.
    */
  def charBigramRelation(model: PipelineModel, df: DataFrame, idCol: String): DataFrame = {
    val cvModel = model.stages.collectFirst { case m: CountVectorizerModel => m }.get
    val vocab = cvModel.vocabulary
    val spark = df.sparkSession
    import spark.implicits._
    val vocabDf = broadcast(vocab.zipWithIndex.toSeq.toDF("term", "term_idx"))
    // Per-document term counts + L2 weights are LOCAL (graft.functions
    // TermCounts): no (doc, term) shuffle, no norms re-join — the only
    // shuffle left is the caller's final sort.
    val transformed = model.transform(df)
    val termCounts = org.apache.spark.sql.graftshim.Shim.column(
      graft.functions.TermCounts(
        org.apache.spark.sql.graftshim.Shim.expression(transformed("__bigrams"))))
    transformed
      .select(col(idCol), explode(termCounts).as("tc"))
      .join(vocabDf, col("tc.term") === col("term")) // keeps only in-vocab terms
      .select(col(idCol), col("term"), col("tc.tf").as("tf"), col("tc.weight").as("weight"))
  }

  /** F1 as a pure DataFrame aggregation — the fast path for the
    * x1-shaped query (the spark.ml [[charBigramTf]] Pipeline remains
    * the persistence-compatible wrapper, [[charBigramRelation]] its
    * relation form): per-document (term, tf, L2 weight) from ONE
    * compiled TermCounts pass, vocab = CountVectorizer.fit's selection
    * rule (top `vocabSize` terms by total corpus term frequency)
    * re-expressed as a hash agg over the distinct-per-doc pre-counts +
    * TakeOrdered top-K, applied back as a broadcast semi-join.
    *
    * Differences from the RDD fit, both deliberate: ties at the vocab
    * boundary break deterministically (count desc, term asc — the fit's
    * tie order is partition-dependent), and no driver-side vocab
    * roundtrip happens unless truncation actually filters. Scale: the
    * exchanged relation is one row per DISTINCT term per doc (never
    * per occurrence); the vocab side is ≤ vocabSize rows, broadcastable
    * by construction.
    */
  def charBigramTfRelation(df: DataFrame, idCol: String, inputCol: String,
                           vocabSize: Int = 1 << 18): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    // fused string→(term, tf, weight) kernel: the expression-built
    // bigram array re-scans the string per substring (O(len²)/doc)
    val termCounts = Shim.column(graft.functions.CharBigramCounts(
      Shim.expression(col(inputCol))))
    val perDoc = df.select(col(idCol), explode(termCounts).as("tc"))
      .select(col(idCol), col("tc.term").as("term"),
        col("tc.tf").as("tf"), col("tc.weight").as("weight"))
    val vocab = perDoc.groupBy("term").agg(sum("tf").as("__cnt"))
      .orderBy(col("__cnt").desc, col("term")).limit(vocabSize)
      .select("term")
    perDoc.join(broadcast(vocab), Seq("term"), "left_semi")
      .select(col(idCol), col("term"), col("tf"), col("weight"))
  }

  /** Document-frequency relation from a fitted F2 model:
    * (term, df) over the fitted corpus — exact integers for the oracle.
    */
  def docFreqRelation(model: PipelineModel, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val cvModel = model.stages.collectFirst { case m: CountVectorizerModel => m }.get
    val idfModel = model.stages.collectFirst { case m: IDFModel => m }.get
    cvModel.vocabulary.zip(idfModel.docFreq).toSeq.toDF("term", "df")
      .select(col("term"), col("df").cast("long").as("df"))
  }
}
