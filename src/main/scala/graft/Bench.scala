package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footers, streaming state
    // store) so the first timed query doesn't absorb startup cost.
    Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val warm = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val q = warm.toDS().groupByKey(identity).count()
        .writeStream.format("memory").queryName("__warmup").outputMode("complete").start()
      warm.addData(1L, 2L)
      q.processAllAvailable()
      q.stop()
    } catch { case _: Throwable => () }
    // sorted-name order: Map iteration is hash-ordered, which shuffles
    // which query absorbs one-time warmup (codegen, streaming state
    // store) between runs — deterministic order makes rounds comparable
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // Millisecond precision keeps the one-line JSON short enough for the
    // driver's bounded tail capture (76 queries at full double precision
    // overflowed it and the line became unparseable).
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
