package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (round 16): where does the d7/d8/st8 edge-build
  * bucket cap BITE? For each sfDir argument, counts the verified
  * near-dup pair set with and without `maxBucket=64` (the exact
  * d7MaxBucket pipeline: shingle sets -> 16/2 minhash bands -> bucket
  * join -> exact-Jaccard verify). The capped engine path and the
  * capped oracle are hash-compared by Verify/check_oracle; this main
  * pins WHERE capped != uncapped so the parity claim ("engine ==
  * capped oracle at a sf where the cap drops pairs") is evidenced,
  * not assumed. Usage: runMain graft.ProfilePairs <sfDir> [...]
  */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfilePairs <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val docs = Tables.load(spark, dir, "documents")
      // the SHIPPING d7 constants, not copies — if the pipeline is
      // retuned this diagnostic keeps measuring the real configuration
      val ss = functions.TextFunctions.shingleHashes(
        functions.TextFunctions.tokens(col("text")), 3)
      val sets = operators.Dedup.shingleSets(docs, col("doc_id"), ss)
      val bands = operators.Dedup.minHashBandsFromSets(
        sets, QueriesText.dedupK, QueriesText.dedupR)
      val capped = operators.Dedup.nearDupPairsFromSets(
        sets, bands, 1, 2, maxBucket = QueriesText.d7MaxBucket).count()
      val uncapped =
        operators.Dedup.nearDupPairsFromSets(sets, bands, 1, 2).count()
      // candidate-level bite (st6's contract: the DISTINCT pair set
      // BEFORE the Jaccard verify) at the same 64-occupancy cap
      val candCapped = operators.Dedup.lshCandidatePairs(
        bands, maxBucket = QueriesText.d7MaxBucket).count()
      val candUncapped = operators.Dedup.lshCandidatePairs(bands).count()
      println(s"""{"cap_bite":{"sf":"$dir","capped":$capped,"uncapped":$uncapped,"cand_capped":$candCapped,"cand_uncapped":$candUncapped}}""")
    }
    spark.stop()
  }
}
