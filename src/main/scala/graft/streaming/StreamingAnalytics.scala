package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming analytics over event-time streams: watermarked sliding-
  * window aggregation (the Structured Streaming counterpart of the
  * relational census/frequency ops — the reference itself has no time
  * windows, SURVEY §2.4; this is part of the beyond-reference mandate).
  */
object StreamingAnalytics {

  /** Sliding-window per-key event counts + value sums with a watermark:
    * late rows beyond `watermark` are dropped, windows finalize once the
    * watermark passes their end (Append mode compatible).
    */
  def windowedEventStats(events: DataFrame, ts: Column, key: Column, value: Column,
                         window: String, slide: String, watermark: String): DataFrame =
    events
      .withColumn("_ts", ts)
      .withWatermark("_ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("_ts"), window, slide), key.as("key"))
      .agg(
        count(lit(1)).cast("long").as("n_events"),
        sum(value).as("total"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("key"), col("n_events"), col("total"))

  /** Stream-stream event-time interval join — the LIVE twin of the
    * batch bucketized range join: probe events against a stream of
    * `[w_start, w_start + windowSeconds)` windows. Spark REFUSES a
    * stream-stream join without an equality predicate (unbounded
    * symmetric state) — and the batch trick supplies one: windows
    * explode to the ≤ 2 fixed-width epoch buckets they cover, probes
    * compute their single bucket, and StreamingSymmetricHashJoin keys
    * its state on the bucket with the time bounds as residual. The
    * two-sided event-time bound plus the watermarks then makes state
    * FINITE: a window row is evicted once the probe watermark passes
    * its end, a probe row after the watermark delay. Inner-join rows
    * emit in their arrival micro-batch (no watermark gating on
    * output). Both `probeTs` and `winStart` must be TimestampType
    * event-time columns.
    */
  def intervalJoin(probe: DataFrame, windows: DataFrame,
                   probeTs: String, winStart: String,
                   windowSeconds: Long, watermark: String): DataFrame = {
    val wUs = windowSeconds * 1000000L // bucket width = window length, µs
    val win = windows.withWatermark(winStart, watermark)
      .withColumn("_wbkt", explode(sequence(
        expr(s"unix_micros($winStart) div ${wUs}L"),
        expr(s"(unix_micros($winStart) + ${wUs}L - 1) div ${wUs}L"))))
    val pr = probe.withWatermark(probeTs, watermark)
      .withColumn("_pbkt", expr(s"unix_micros($probeTs) div ${wUs}L"))
    pr.join(win, pr("_pbkt") === win("_wbkt") &&
        expr(s"$probeTs >= $winStart AND " +
          s"$probeTs < $winStart + interval $windowSeconds seconds"))
      .drop("_pbkt", "_wbkt")
  }
}
