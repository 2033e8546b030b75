package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (round 21): the connectedComponents first-round
  * specialization is invisible in a query's FINAL plan (the loop's
  * rounds materialize through localCheckpoint, so d7/d8 end on a
  * checkpoint scan). This main prints the two loop-internal round-1
  * plans side by side on the real d7 pair relation — the GENERIC
  * round-1 shape (sym ⋈ identity-labels → groupBy → left-join → hop)
  * the pre-round code materialized, and the SPECIALIZED seed
  * (groupBy over sym → hop) that replaced it — so the "one sym-sized
  * shuffle join saved" claim is checkable from the committed
  * plans/r21/d7_*.txt excerpts.
  *
  * Usage: runMain graft.ProfileCc <sfDir>
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileCc <sfDir>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")
    val ss = functions.TextFunctions.shingleHashes(
      functions.TextFunctions.tokens(col("text")), 3)
    val sets = operators.Dedup.shingleSets(docs, col("doc_id"), ss)
    val bands = operators.Dedup.minHashBandsFromSets(
      sets, QueriesText.dedupK, QueriesText.dedupR)
    val pairs = operators.Dedup.nearDupPairsFromSets(
      sets, bands, 1, 2, maxBucket = QueriesText.d7MaxBucket)
      .select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").cast("long").as("src"),
      col("doc_b").cast("long").as("dst"))
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // the pre-round generic round 1 on identity labels
    val labels0 = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
    val nbrMin = sym.join(labels0, col("dst") === col("node"))
      .groupBy(col("src").as("n2")).agg(min(col("comp")).as("nbr_min"))
    val stepped = labels0.join(nbrMin, col("node") === col("n2"), "left")
      .select(col("node"), least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp1"))
    println("===== OLD generic round 1 (sym ⋈ identity labels) =====")
    println(fmt(stepped))
    // the round-21 specialized seed
    val seed = sym.groupBy(col("src")).agg(min(col("dst")).as("md"))
      .select(col("src").as("node"), least(col("src"), col("md")).as("comp1"))
    println("===== NEW specialized seed (one aggregation) =====")
    println(fmt(seed))
    spark.stop()
  }
}
