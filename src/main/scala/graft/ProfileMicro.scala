package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the PQ assignment hot path: synthetic
  * (vid, m, sub) subvector rows × k* centroids, timing the join+argmin
  * aggregate in isolation under the candidate formulations. Not part
  * of any query's semantics.
  */
object ProfileMicro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 2000
    val m = 8
    val k = 256
    val subDim = 8
    val rnd = new scala.util.Random(7)
    val sv = (0 until n).flatMap(v => (0 until m).map(mi =>
        (v.toLong, mi, Array.fill(subDim)(rnd.nextInt(255).toLong - 127))))
      .toDF("vid", "m", "sub").repartition(32).persist()
    sv.count()
    val cents = (0 until m).flatMap(mi => (0 until k).map(c =>
        (mi, c.toLong, Array.fill(subDim)(rnd.nextInt(255).toLong - 127))))
      .toDF("m", "cell", "cent")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"case":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.3f,"rows":$r}""")
    }
    val dist = functions.VectorFunctions.intSqDist(col("sub"), col("cent"))
    if (sys.env.contains("SPARK_GRAFT_MICRO_EXPLAIN")) {
      sv.join(broadcast(cents), Seq("m"))
        .select(col("vid"), col("m"), struct(dist.as("d"), col("cell")).as("dc"))
        .groupBy("vid", "m").agg(min(col("dc")).as("mn"))
        .select(col("vid"), col("m"), col("mn.cell").as("cell"))
        .explain("formatted")
    }
    (0 until 2).foreach { _ =>
      t("join only (count)") {
        sv.join(broadcast(cents), Seq("m")).where(dist >= 0).count()
      }
      t("argmin scalar-key min(struct(d,cell))") {
        sv.join(broadcast(cents), Seq("m"))
          .select(col("vid"), col("m"), struct(dist.as("d"), col("cell")).as("dc"))
          .groupBy("vid", "m").agg(min(col("dc")).as("mn"))
          .select(col("vid"), col("m"), col("mn.cell").as("cell"))
          .queryExecution.toRdd.count()
      }
      t("argmin array-key min_by (r18 shape)") {
        sv.join(broadcast(cents), Seq("m"))
          .withColumn("dist", dist)
          .groupBy(col("vid"), col("m"), col("sub"))
          .agg(min_by(col("cell"), struct(col("dist"), col("cell"))).as("cell"))
          .select(col("vid"), col("m"), col("cell"))
          .queryExecution.toRdd.count()
      }
      t("argmin packed-long scalar-key (r19 shape)") {
        sv.join(broadcast(cents), Seq("m"))
          .select(col("vid"), col("m"), (dist * lit(1L << 20) + col("cell")).as("pk"))
          .groupBy("vid", "m").agg(min(col("pk")).as("pk"))
          .select(col("vid"), col("m"), (col("pk") % lit(1L << 20)).as("cell"))
          .queryExecution.toRdd.count()
      }
      t("argmin packed-long array-in-key (r19 coarse shape)") {
        sv.join(broadcast(cents), Seq("m"))
          .select(col("vid"), col("m"), col("sub"), (dist * lit(1L << 20) + col("cell")).as("pk"))
          .groupBy("vid", "m", "sub").agg(min(col("pk")).as("pk"))
          .select(col("vid"), col("m"), col("sub"), (col("pk") % lit(1L << 20)).as("cell"))
          .queryExecution.toRdd.count()
      }
      t("argmin scalar-key carrying sub") {
        sv.join(broadcast(cents), Seq("m"))
          .select(col("vid"), col("m"), struct(dist.as("d"), col("cell"), col("sub")).as("dcs"))
          .groupBy("vid", "m").agg(min(col("dcs")).as("mn"))
          .select(col("vid"), col("m"), col("mn.sub").as("sub"), col("mn.cell").as("cell"))
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
