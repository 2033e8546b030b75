package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles over a bounded-cardinality integer
  * measure (token counts, document lengths, session sizes — the
  * length-distribution statistics a training-data pipeline reports).
  *
  * The scale path is the value histogram: `groupBy(value).count()`
  * first collapses 100 TB of rows into at most `|distinct values|`
  * rows map-side (partial aggregation), and only that bounded
  * histogram is cumulated and probed. The cumulative-sum window runs
  * over the AGGREGATED relation — single-partition by construction but
  * bounded by the value domain (a document length), never by the
  * corpus. This is exact (no sketch, no interpolation): the p-th
  * percentile is the smallest value whose cumulative count reaches
  * rank ⌈p·N/100⌉, computed in pure integer arithmetic so any ANSI-SQL
  * engine reproduces it bit-for-bit.
  */
object Quantiles {

  /** (pct, value) rows, one per requested percentile, ascending.
    * `value` must be an integral column; N is counted from `df` itself.
    */
  def histogramQuantiles(spark: SparkSession, df: DataFrame, value: Column,
                         pcts: Seq[Int], valueName: String): DataFrame =
    quantilesFromHistogram(spark,
      df.select(value.cast("long").as("v")).groupBy("v").agg(count(lit(1)).as("c")),
      pcts, valueName)

  /** Per-stratum exact quantiles — the grouped generalization (per-
    * language/per-source length percentiles, the report a data-mixing
    * pipeline actually publishes). Here the cumulative window
    * partitions BY THE STRATUM, so unlike the global form there is no
    * single-partition exchange anywhere: histogram partial-agg on
    * (stratum, v), cumsum within stratum, per-stratum totals joined
    * back broadcast (bounded by #strata). Output one (stratum, pct,
    * value) row per stratum × percentile.
    */
  def groupedHistogramQuantiles(spark: SparkSession, df: DataFrame,
                                stratum: Column, value: Column,
                                pcts: Seq[Int], valueName: String): DataFrame = {
    import spark.implicits._
    val hist = df.select(stratum.as("g"), value.cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-stratum totals come from the histogram, not a second corpus
    // scan: sum(c) per g over the bounded hist relation is exactly
    // count(*) per g over df, and keeps the operator one-pass
    val tot = hist.groupBy("g").agg(sum("c").cast("long").as("n"))
    val wanted = pcts.map(_.toLong).toDF("pct")
    cum.join(broadcast(tot), "g").crossJoin(broadcast(wanted))
      .where(col("cum") >= expr("(pct * n + 99) div 100"))
      .groupBy("g", "pct").agg(min("v").cast("long").as(valueName))
      .select(col("g"), col("pct").cast("long").as("pct"), col(valueName))
      .orderBy("g", "pct")
  }

  /** Same probe over an already-built `(v, c)` histogram — the reuse
    * point for streaming twins, whose keyed counter state IS the
    * histogram (st18 feeds its final counter snapshot here, so the
    * streamed percentiles hash-match the batch oracle).
    */
  def quantilesFromHistogram(spark: SparkSession, hist: DataFrame,
                             pcts: Seq[Int], valueName: String): DataFrame = {
    import spark.implicits._
    val cum = hist.withColumn("cum",
      sum("c").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = hist.agg(sum("c").cast("long").as("n"))
    val wanted = pcts.map(_.toLong).toDF("pct")
    cum.crossJoin(broadcast(tot)).crossJoin(broadcast(wanted))
      .where(col("cum") >= expr("(pct * n + 99) div 100"))
      .groupBy("pct").agg(min("v").cast("long").as(valueName))
      .select(col("pct").cast("long").as("pct"), col(valueName))
      .orderBy("pct")
  }
}
