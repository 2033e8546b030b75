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
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.count() // warm parquet footers
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorRunTime)
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = sc.stageInfo
        val ms = si.taskMetrics
        if (ms != null && ms.executorRunTime > 500)
          println(s"""{"slowStage":${si.stageId},"name":${'"'}${si.name.take(60)}${'"'},""" +
            s""""tasks":${si.numTasks},"runMs":${ms.executorRunTime},""" +
            s""""cpuMs":${ms.executorCpuTime / 1000000},"gcMs":${ms.jvmGCTime}}""")
      }
    })
    def t[A](name: String)(f: => A): A = {
      val (j0, s0, k0, m0) = (jobs.get, stages.get, tasks.get, taskMs.get)
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(150) // let the listener bus drain (dev-only profiler)
      println(f"""{"phase":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.3f,""" +
        s""""jobs":${jobs.get - j0},"stages":${stages.get - s0},""" +
        s""""tasks":${tasks.get - k0},"taskSec":${(taskMs.get - m0) / 1e3}}""")
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
