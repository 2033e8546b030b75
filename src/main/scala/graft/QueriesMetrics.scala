package graft

import org.apache.spark.sql.functions._

import graft.operators.Metrics

/** Metric-suite queries (SURVEY §2.5 A1-A3) run over the documents table
  * with `lang` as the true clustering and `source` as the predicted one —
  * the driver-testdata stand-in for the reference's (gold entity,
  * predicted cluster) assignment relation.
  */
object QueriesMetrics {
  import QueriesRelational.Q

  val a1Muc: Q = (s, dir) =>
    Metrics.muc(Tables.load(s, dir, "documents"), col("lang"), col("source"))

  val a1MucSql: String =
    """WITH p AS (
      |  SELECT sum(sz - parts) AS pn, sum(sz - 1) AS pd FROM (
      |    SELECT source, count(*) AS sz, count(DISTINCT lang) AS parts
      |    FROM documents GROUP BY source)),
      |r AS (
      |  SELECT sum(sz - parts) AS rn, sum(sz - 1) AS rd FROM (
      |    SELECT lang, count(*) AS sz, count(DISTINCT source) AS parts
      |    FROM documents GROUP BY lang))
      |SELECT cast(pn as double)/(cast(pd as double)+1e-13) AS muc_p,
      |       cast(rn as double)/(cast(rd as double)+1e-13) AS muc_r,
      |       2.0 * (cast(pn as double)/(cast(pd as double)+1e-13))
      |           * (cast(rn as double)/(cast(rd as double)+1e-13))
      |         / ((cast(pn as double)/(cast(pd as double)+1e-13))
      |            + (cast(rn as double)/(cast(rd as double)+1e-13)) + 1e-13) AS muc_f1
      |FROM p, r""".stripMargin

  val a2B3: Q = (s, dir) =>
    Metrics.bCubed(Tables.load(s, dir, "documents"), col("lang"), col("source"))

  val a2B3Sql: String =
    s"""WITH pairs AS (SELECT lang AS t, source AS p, count(*) AS c FROM documents GROUP BY 1, 2),
       |psz AS (SELECT p, sum(c) AS ps FROM pairs GROUP BY p),
       |tsz AS (SELECT t, sum(c) AS ts FROM pairs GROUP BY t),
       |agg AS (
       |  SELECT sum((c*c*${Metrics.B3Scale}) // ps) AS pnum,
       |         sum((c*c*${Metrics.B3Scale}) // ts) AS rnum,
       |         sum(c) AS n
       |  FROM pairs JOIN psz USING (p) JOIN tsz USING (t))
       |SELECT cast(pnum as double)/(cast(${Metrics.B3Scale} as double)*cast(n as double)) AS b3_p,
       |       cast(rnum as double)/(cast(${Metrics.B3Scale} as double)*cast(n as double)) AS b3_r,
       |       2.0 * (cast(pnum as double)/(cast(${Metrics.B3Scale} as double)*cast(n as double)))
       |           * (cast(rnum as double)/(cast(${Metrics.B3Scale} as double)*cast(n as double)))
       |         / ((cast(pnum as double)/(cast(${Metrics.B3Scale} as double)*cast(n as double)))
       |            + (cast(rnum as double)/(cast(${Metrics.B3Scale} as double)*cast(n as double)))) AS b3_f1
       |FROM agg""".stripMargin

  /** CEAF-e needs the Hungarian matching — not SQL-expressible; the
    * driver records a rows-only check for it.
    */
  val a3CeafE: Q = (s, dir) =>
    Metrics.ceafE(Tables.load(s, dir, "documents"), col("lang"), col("source"))

  val queries: Map[String, Q] = Map(
    "a1_muc" -> a1Muc,
    "a2_b3" -> a2B3,
    "a3_ceafe" -> a3CeafE)

  val oracles: Map[String, String] = Map(
    "a1_muc" -> a1MucSql,
    "a2_b3" -> a2B3Sql)
}
