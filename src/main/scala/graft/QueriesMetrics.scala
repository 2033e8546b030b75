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

  /** CEAF-e: the Hungarian matching has no direct SQL form, but THIS
    * query's instance is 5 true × 20 predicted clusters, so the oracle
    * ENUMERATES every injective assignment (P(20,5) = 1.86M
    * permutations, a 5-way self-join) and takes the max total. Float
    * exactness: each permutation's total folds its 5 weights sorted by
    * predicted-cluster string — the same ascending-column order the
    * Hungarian's final sum uses with sorted cluster ids — so the
    * optimum matches bit-for-bit, not just to tolerance.
    */
  val a3CeafE: Q = (s, dir) =>
    Metrics.ceafE(Tables.load(s, dir, "documents"), col("lang"), col("source"))

  val a3CeafESql: String =
    """WITH pairs AS (SELECT lang AS t, source AS p, count(*) AS c FROM documents GROUP BY 1,2),
      |psz AS (SELECT p, sum(c) AS ps FROM pairs GROUP BY p),
      |tsz AS (SELECT t, sum(c) AS ts FROM pairs GROUP BY t),
      |phi AS (
      |  SELECT t, p, 2.0 * c / (ts + ps) AS w
      |  FROM pairs JOIN psz USING (p) JOIN tsz USING (t)),
      |trues AS (SELECT t, row_number() OVER (ORDER BY t) AS rk FROM (SELECT DISTINCT t FROM pairs)),
      |preds AS (SELECT DISTINCT p FROM pairs),
      |nt AS (SELECT count(*) AS n FROM trues),
      |np AS (SELECT count(*) AS n FROM preds),
      |guard AS (
      |  SELECT CASE WHEN (SELECT n FROM nt) = 5 AND (SELECT n FROM np) >= 5 THEN 1
      |    ELSE error('a3_ceafe oracle enumerates a FIXED 5-true-cluster assignment polytope; '
      |               || 'this fixture has a different cardinality - regenerate the k-way join')
      |  END AS ok),
      |perms AS (
      |  SELECT a0.p AS p0, a1.p AS p1, a2.p AS p2, a3.p AS p3, a4.p AS p4
      |  FROM preds a0, preds a1, preds a2, preds a3, preds a4
      |  WHERE a0.p <> a1.p AND a0.p <> a2.p AND a0.p <> a3.p AND a0.p <> a4.p
      |    AND a1.p <> a2.p AND a1.p <> a3.p AND a1.p <> a4.p
      |    AND a2.p <> a3.p AND a2.p <> a4.p AND a3.p <> a4.p),
      |tot AS (
      |  SELECT list_reduce(list_prepend(0.0::DOUBLE,
      |           list_transform(
      |             list_sort([struct_pack(pp := p0, ww := coalesce(f0.w, 0.0)),
      |                        struct_pack(pp := p1, ww := coalesce(f1.w, 0.0)),
      |                        struct_pack(pp := p2, ww := coalesce(f2.w, 0.0)),
      |                        struct_pack(pp := p3, ww := coalesce(f3.w, 0.0)),
      |                        struct_pack(pp := p4, ww := coalesce(f4.w, 0.0))]),
      |             s -> s.ww)),
      |           (acc, x) -> acc + x) AS total
      |  FROM perms
      |  LEFT JOIN phi f0 ON f0.t = (SELECT t FROM trues WHERE rk = 1) AND f0.p = p0
      |  LEFT JOIN phi f1 ON f1.t = (SELECT t FROM trues WHERE rk = 2) AND f1.p = p1
      |  LEFT JOIN phi f2 ON f2.t = (SELECT t FROM trues WHERE rk = 3) AND f2.p = p2
      |  LEFT JOIN phi f3 ON f3.t = (SELECT t FROM trues WHERE rk = 4) AND f3.p = p3
      |  LEFT JOIN phi f4 ON f4.t = (SELECT t FROM trues WHERE rk = 5) AND f4.p = p4),
      |best AS (SELECT max(total) AS total FROM tot)
      |SELECT total / (SELECT n FROM nt) AS ceafe_p,
      |       total / (SELECT n FROM np) AS ceafe_r,
      |       2.0 * (total / (SELECT n FROM nt)) * (total / (SELECT n FROM np))
      |         / ((total / (SELECT n FROM nt)) + (total / (SELECT n FROM np))) AS ceafe_f1
      |FROM best, guard""".stripMargin

  val queries: Map[String, Q] = Map(
    "a1_muc" -> a1Muc,
    "a2_b3" -> a2B3,
    "a3_ceafe" -> a3CeafE)

  val oracles: Map[String, String] = Map(
    "a1_muc" -> a1MucSql,
    "a2_b3" -> a2B3Sql,
    "a3_ceafe" -> a3CeafESql)
}
