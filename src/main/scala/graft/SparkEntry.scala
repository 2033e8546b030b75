package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * SURVEY §2 operator); `oracleSql` carries the DuckDB-equivalent SQL for
  * every SQL-expressible query (the driver hash-compares results).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesRelational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesMetrics.queries ++ QueriesText.queries ++
      QueriesVector.queries ++ QueriesGreedy.queries ++ QueriesGrinch.queries ++
      QueriesSources.queries ++ QueriesFeatures.queries ++ QueriesStreaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    QueriesRelational.oracles ++ QueriesMetrics.oracles ++ QueriesText.oracles ++
      QueriesVector.oracles ++ QueriesGreedy.oracles ++ QueriesGrinch.oracles ++
      QueriesSources.oracles ++ QueriesFeatures.oracles ++ QueriesStreaming.oracles
}
