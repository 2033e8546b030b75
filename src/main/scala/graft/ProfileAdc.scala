package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the v16/v16b fixed overhead (VERDICT
  * r18 #6): times the eager phases of the IVFADC build separately —
  * index stats+build, PQ training collect, and the final search/rerank
  * materialization — so the "two Lloyd trainings + several collects"
  * hypothesis is measured, not guessed. Not part of any query's
  * semantics; prints one JSON line per phase.
  */
object ProfileAdc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.count() // warm parquet footers
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"phase":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    (0 until 2).foreach { it =>
      println(s"""{"iter":$it}""")
      val ix = t("intIvfIndex (stats agg)") {
        operators.Similarity.intIvfIndex(emb, col("vec_id"), col("embedding"), 0)
      }
      t("fin materialize (coarse Lloyd)") { ix.fin.count() }
      val short = t("adc plan build (PQ training collect)") {
        operators.Similarity.ivfAdcRerankFromIndex(ix, emb,
          col("vec_id"), col("embedding"),
          m = 8, subDim = 8, kCodes = 256, shortlist = 32, topK = 3,
          isQuery = v => v % 50 === 0, nProbe = 2,
          trainTarget = operators.Similarity.AdcTrainTarget)
      }
      t("final rerank materialize") { short.queryExecution.toRdd.count() }
      ix.release()
    }
    spark.stop()
  }
}
