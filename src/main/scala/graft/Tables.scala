package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries in [[SparkEntry]] take a scale-factor directory and read
  * through here, so predicate pushdown / column pruning reach the parquet
  * scans and the same code runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The engine's EVENT-TIME contract: `events.ts` is BIGINT epoch
    * NANOSECONDS. The first driver-data generation carried
    * TIMESTAMP(NANOS), which `nanosAsLong` already reads as long; later
    * generations carry TIMESTAMP(MICROS), which Spark reads as a
    * timestamp type instead — normalize those to the same long-nanos
    * column (µs·1000, exact) so every event-time query and its DuckDB
    * oracle (`epoch_ns(ts)` ≡ this column) see one representation
    * regardless of the file's physical annotation. Only the events
    * table: the relational tables' date-carrying timestamps
    * (l_shipdate, o_orderdate) are consumed AS timestamps on both
    * engines and must stay that way. Column-local and
    * pushdown-transparent: the cast sits above the scan, pruning and
    * non-ts filters still reach parquet.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") df
    else df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampNTZType | TimestampType =>
          d.withColumn(f.name, expr(s"unix_micros(cast(`${f.name}` as timestamp)) * 1000L"))
        case _ => d
      }
    }
  }

  /** Register every table as a temp view named after itself, so
    * `spark.sql` queries (kept textually parallel to the DuckDB oracle
    * SQL) resolve. Idempotent and cheap — catalog-only.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
