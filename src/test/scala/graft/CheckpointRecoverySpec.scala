package graft

import org.apache.spark.sql.functions._

import graft.streaming.{StreamingDedupOrdered, StreamingPacking}
import graft.streaming.StreamingDedupOrdered.DocEvent
import graft.streaming.StreamingPacking.PackEvent

/** Fault-tolerance contract of the stateful streaming operators: a
  * query STOPPED and RESTARTED from its checkpoint must resume with its
  * keyed state intact — the 100 TB requirement the per-operator scale
  * notes assume but nothing else executes. Both tests use the
  * production sink (parquet + _spark_metadata, exactly-once) because
  * the memory sink is not restart-compatible by design.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  private def rmRf(d: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(d).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("dedup state survives a stop/restart: a duplicate arriving after recovery is still dropped") {
    val in = tmp("ck-dedup-in-"); val out = tmp("ck-dedup-out-"); val ck = tmp("ck-dedup-ck-")
    try {
      def start() = {
        val stream = spark.readStream
          .schema(org.apache.spark.sql.Encoders.product[DocEvent].schema)
          .parquet(in.toString)
        StreamingDedupOrdered.firstByOrder(stream.as[DocEvent])
          .writeStream.format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", ck.toString)
          .outputMode("append").start()
      }
      QueriesStreaming.withShufflePartitions(spark, 2) {
        // life 1: "aa" and "bb" enter state
        Seq(DocEvent("aa", 3L, 30L), DocEvent("bb", 1L, 10L)).toDF()
          .coalesce(1).write.mode("append").parquet(in.toString)
        val q1 = start()
        try q1.processAllAvailable() finally q1.stop()
        // life 2 (new query, same checkpoint): a redelivered "aa" must
        // be dropped — only possible if the keyed state was recovered —
        // while the unseen "cc" emits normally
        Seq(DocEvent("aa", 9L, 90L), DocEvent("cc", 7L, 70L)).toDF()
          .coalesce(1).write.mode("append").parquet(in.toString)
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
      }
      val got = spark.read.parquet(out.toString)
        .as[(String, Long, Long)].collect().toSet
      got shouldBe Set(("aa", 3L, 30L), ("bb", 1L, 10L), ("cc", 7L, 70L))
    } finally { rmRf(in); rmRf(out); rmRf(ck) }
  }

  test("packing offsets survive a stop/restart: post-recovery documents continue the shard's token stream") {
    val in = tmp("ck-pack-in-"); val out = tmp("ck-pack-out-"); val ck = tmp("ck-pack-ck-")
    try {
      def start() = {
        val stream = spark.readStream
          .schema(org.apache.spark.sql.Encoders.product[PackEvent].schema)
          .parquet(in.toString)
        StreamingPacking.pack(stream.as[PackEvent], seqLen = 10)
          .writeStream.format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", ck.toString)
          .outputMode("append").start()
      }
      QueriesStreaming.withShufflePartitions(spark, 2) {
        // life 1: shard 0 packs 7 tokens
        Seq(PackEvent(0L, 1L, 5L, 7L)).toDF()
          .coalesce(1).write.mode("append").parquet(in.toString)
        val q1 = start()
        try q1.processAllAvailable() finally q1.stop()
        // life 2: the next document must start at offset 7, not 0 —
        // only possible if the per-shard running offset was recovered
        Seq(PackEvent(0L, 2L, 6L, 4L)).toDF()
          .coalesce(1).write.mode("append").parquet(in.toString)
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
      }
      spark.read.parquet(out.toString).count() shouldBe 2
      val rows = spark.read.parquet(out.toString)
        .select("docId", "tokStart", "tokEnd").as[(Long, Long, Long)].collect().toSet
      rows shouldBe Set((1L, 0L, 7L), (2L, 7L, 11L))
    } finally { rmRf(in); rmRf(out); rmRf(ck) }
  }
}
