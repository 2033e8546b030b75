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
}
