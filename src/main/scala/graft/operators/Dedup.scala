package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.TextFunctions.P

/** Large-scale training-data deduplication operators (the LLM-pipeline
  * pack): exact dedup, MinHash+LSH banding, near-dup verification.
  *
  * Design for 100 TB: nothing here ever materializes the n² pair space.
  * Exact dedup is one key-partitioned shuffle; MinHash banding maps each
  * doc to `bands` small (band, hash) keys, the candidate self-join
  * shuffles on those keys (bucket sizes are the collision sets, not n),
  * and only candidates pay the exact set-intersection verify. All hashes
  * are integer mod-p (TextFunctions) so results are engine-exact.
  *
  * Conceptual lineage: the reference's char-bigram blocking idea
  * (`/root/reference/meercat/fit_vectorizer.py:20-23`) and its bounded
  * state clustering (`meercat/nn_thresh.py:27-101`) — re-expressed as
  * declarative shuffle-on-signature joins instead of a sequential scan.
  */
object Dedup {

  /** Exact duplicate grouping: canonical id = min id among identical
    * `text`. One hash shuffle on the text key. `is_dup` marks non-canonical
    * rows. (Hash-groupBy exact dedup.)
    */
  def exactDedup(df: DataFrame, text: Column, id: Column): DataFrame =
    df.withColumn("canonical_id", min(id).over(Window.partitionBy(text)))
      .withColumn("is_dup", id =!= col("canonical_id"))

  /** MinHash LSH banding: k-hash signature over a distinct shingle-hash
    * set column, split into `k/rowsPerBand` bands; emits one
    * (doc, band, band_hash) row per band. Docs sharing any band hash are
    * near-dup candidates (standard banding estimate: collision
    * probability 1−(1−J^r)^b).
    */
  def minHashBands(df: DataFrame, id: Column, shingleSet: Column,
                   k: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    require(k % rowsPerBand == 0, "k must divide into bands")
    val nBands = k / rowsPerBand
    val withSig = df.select(id.as("doc"), TextFunctions.minHashSignature(shingleSet, k).as("sig"))
    val bandHash = (0 until rowsPerBand).foldLeft(lit(0L)) { (acc, r) =>
      (acc * 31 + element_at(col("sig"), col("band") * rowsPerBand + r + 1)) % P
    }
    withSig
      .select(col("doc"), explode(sequence(lit(0), lit(nBands - 1))).as("band"), col("sig"))
      .withColumn("band_hash", bandHash)
      .drop("sig")
  }

  /** Distinct candidate pairs (a < b) from shared LSH band hashes. The
    * join shuffles on (band, band_hash) — collision buckets, not docs.
    */
  def lshCandidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("band_hash"), col("doc").as("doc_a"))
    val b = bands.select(col("band"), col("band_hash"), col("doc").as("doc_b"))
    a.join(b, Seq("band", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Verified near-duplicate pairs: LSH candidates whose exact Jaccard
    * over `setCol` (a distinct element-hash array keyed by `id`) meets
    * `num/den ≥ threshNum/threshDen` (integer cross-multiplied — exact).
    * Output carries the exact intersection/union counts plus the ratio.
    */
  def nearDupPairs(docs: DataFrame, id: Column, setCol: Column, bands: DataFrame,
                   threshNum: Int, threshDen: Int): DataFrame = {
    val sets = docs.select(id.as("doc"), setCol.as("hs"))
    val cand = lshCandidatePairs(bands)
    cand
      .join(sets.select(col("doc").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(sets.select(col("doc").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("j_num", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("j_den", (size(col("hs_a")) + size(col("hs_b"))).cast("long") - col("j_num"))
      .where(col("j_num") * threshDen >= col("j_den") * threshNum)
      .select(
        col("doc_a"), col("doc_b"), col("j_num"), col("j_den"),
        (col("j_num").cast("double") / col("j_den").cast("double")).as("jaccard"))
  }
}
