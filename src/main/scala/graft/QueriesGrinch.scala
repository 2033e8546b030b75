package graft

import org.apache.spark.sql.functions._

import graft.operators.{Grinch, Trees}

/** GRINCH hierarchical-clustering queries (C11-C19) over the embeddings
  * table. The tree automaton is inherently sequential and stateful — no
  * SQL form exists — so these are rows-only driver checks; the
  * literature/structural goldens live in GrinchSpec.
  */
object QueriesGrinch {
  import QueriesRelational.Q

  private val P = Grinch.Params(sim = "dot", norm = "l2", activeLeafLimit = 200)

  /** h1 — flat clustering at θ=0.25 with a 200-leaf memory budget. */
  val h1GrinchFlat: Q = (s, dir) =>
    Grinch.flatCluster(Tables.load(s, dir, "embeddings"),
      col("vec_id"), col("embedding"), col("vec_id"), P, threshold = 0.25)
      .select(col("id").as("vec_id"), col("pred_cluster"))
      .orderBy("vec_id")

  /** h2 — the dendrogram relation (S11's sink as a DataFrame). */
  val h2GrinchDendrogram: Q = (s, dir) =>
    Grinch.dendrogram(Tables.load(s, dir, "embeddings"),
      col("vec_id"), col("embedding"), col("vec_id"), col("label"), P)
      .orderBy(col("uid").cast("long"))

  /** h3 — A4 dendrogram purity of the GRINCH tree w.r.t. the label
    * column. [[Trees.purityAuto]] picks the driver fold below 100k
    * nodes and the distributed groupBy(parent) histogram roll-up
    * ([[Trees.dendrogramPurityDF]]) above it, so a single global
    * stream's tree never materializes on the driver.
    */
  val h3GrinchPurity: Q = (s, dir) => {
    val tree = Grinch.dendrogram(Tables.load(s, dir, "embeddings"),
      col("vec_id"), col("embedding"), col("vec_id"), col("label"), P)
    val purity = Trees.purityAuto(tree)
    import s.implicits._
    Seq(purity).toDF("purity")
  }

  /** h4 — the scale path: one independent GRINCH tree per label key,
    * built in parallel partitions (Grinch.flatClusterByKey). Rows-only
    * like h1; per-key parity with single-stream trees is spec-pinned.
    */
  val h4GrinchByLabel: Q = (s, dir) =>
    Grinch.flatClusterByKey(Tables.load(s, dir, "embeddings"),
      col("label"), col("vec_id"), col("embedding"), col("vec_id"), P, threshold = 0.25)
      .select(col("key").as("label"), col("id").as("vec_id"), col("pred_cluster"))
      .orderBy("vec_id")

  // ---------------------------------------------------------------- h5
  // The integer-GRINCH oracle: the v9/g3 technique applied to the last
  // no-oracle island. Config rotateCap=0 (the rotate walk's
  // `numDescendants < cap` guard never passes), graftCap=0 (the
  // ancestor filter empties both graft candidate arrays), norm="none",
  // sim="dot", no pruning — under which the automaton's insert log
  // collapses to a closed form: every step i>=1 splices a new parent
  // p_i (uid n+i-1) above sib_i = argmax_{j<i} intdot(q_i, q_j) (ties
  // to the LOWEST j, = cknn's ascending first-max scan), and since
  // splices only ever target leaves,
  //   parent(leaf j)  = p_{last step whose event touched j}
  //   parent(p_i)     = p_{previous step that spliced at sib_i}
  //                     (or p_{sib_i}'s own insertion; NULL for p_1)
  // — plain window functions over the (i, sib_i) relation, no
  // recursion. Vectors are int8-quantized under one global scale
  // exactly like v9, so every linkage score is an exact integer and
  // the Spark run (the REAL automaton, not a special case) replays
  // bit-for-bit in SQL. Semantics: `grinch_alg.py:166-202` with both
  // caps 0.
  private[graft] val IntP = Grinch.Params(rotateCap = 0, graftCap = 0,
    sim = "dot", norm = "none", activeLeafLimit = -1)
  private[graft] val H5N = 500

  val h5GrinchIntTree: Q = (s, dir) => {
    val emb = Tables.load(s, dir, "embeddings").where(col("vec_id") < H5N)
    val maxAbs = emb.agg(max(aggregate(col("embedding"), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double")))))).collect()(0).getDouble(0)
    val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
    val qdf = emb.select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") / lit(scale)).cast("long")).as("q"),
      col("label"))
    Grinch.dendrogram(qdf, col("vec_id"), col("q"), col("vec_id"), col("label"), IntP)
      .select(col("uid").cast("long").as("uid"),
        col("parent_uid").cast("long").as("parent_uid"), col("label"))
      .orderBy("uid")
  }

  /** Shared WITH-clause body deriving the h5 closed-form tree relation
    * `tree(uid, parent_uid, label)` — h5 selects it directly, h6 runs
    * the purity roll-up on top.
    */
  private val intTreeCtes: String = {
    val idot =
      "list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 64), " +
        "di -> a.q[di] * b.q[di])), (acc, x) -> acc + x)"
    s"""sel AS (
       |  SELECT vec_id, embedding, label,
       |         row_number() OVER (ORDER BY vec_id) - 1 AS pos
       |  FROM embeddings WHERE vec_id < $H5N),
       |nn AS (SELECT count(*) AS n FROM sel),
       |gs AS (
       |  SELECT max(list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(1, 64), mi -> abs(embedding[mi]::DOUBLE))),
       |    (acc, x) -> greatest(acc, x))) AS maxabs
       |  FROM sel),
       |sc AS (SELECT CASE WHEN maxabs = 0 THEN 1.0::DOUBLE ELSE maxabs / 127.0 END AS scale FROM gs),
       |qv AS (
       |  SELECT pos, label, list_transform(generate_series(1, 64),
       |    qi -> cast(round(embedding[qi]::DOUBLE / scale) AS BIGINT)) AS q
       |  FROM sel, sc),
       |pairs AS (
       |  SELECT a.pos AS i, b.pos AS j, $idot AS d
       |  FROM qv a JOIN qv b ON b.pos < a.pos),
       |sibs AS (
       |  SELECT i, j AS sib FROM (
       |    SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY d DESC, j) AS rk
       |    FROM pairs) WHERE rk = 1),
       |internals AS (
       |  SELECT i, sib,
       |         coalesce(lag(i) OVER (PARTITION BY sib ORDER BY i),
       |                  CASE WHEN sib >= 1 THEN sib END) AS prev
       |  FROM sibs),
       |lastev AS (SELECT sib, max(i) AS mi FROM sibs GROUP BY sib),
       |leaves AS (
       |  -- n=1 guard: a lone leaf is the root (parent NULL); without it
       |  -- the closed form degenerates to a uid-0 self-parent and h6's
       |  -- recursive ancestor walk would never terminate.
       |  SELECT l.pos::BIGINT AS uid,
       |         CASE WHEN n <= 1 THEN NULL ELSE
       |           (n + greatest(coalesce(mx.mi, 0),
       |                         CASE WHEN l.pos >= 1 THEN l.pos ELSE 0 END) - 1) END::BIGINT AS parent_uid,
       |         l.label::VARCHAR AS label
       |  FROM qv l LEFT JOIN lastev mx ON mx.sib = l.pos, nn),
       |ints AS (
       |  SELECT (n + i - 1)::BIGINT AS uid,
       |         CASE WHEN prev IS NULL THEN NULL
       |              ELSE (n + prev - 1)::BIGINT END AS parent_uid,
       |         NULL::VARCHAR AS label
       |  FROM internals, nn),
       |tree AS (SELECT * FROM leaves UNION ALL SELECT * FROM ints)""".stripMargin
  }

  val h5GrinchIntTreeSql: String =
    s"WITH $intTreeCtes\nSELECT uid, parent_uid, label FROM tree ORDER BY uid"

  // ---------------------------------------------------------------- h6
  // A4 dendrogram purity, ORACLE-CHECKED: the fixed-point purity fold
  // ([[Trees.dendrogramPurityFixedPoint]] — per (LCA, label) the pair
  // count times (n_l·1e9 div n), exact integers, one final double
  // division) over the h5 integer tree. The oracle rebuilds the same
  // tree from the closed form, walks leaf→root ancestor paths with a
  // recursive CTE, and replays the identical integer roll-up — so the
  // purity METRIC itself (not just the tree) is hash-checked
  // cross-engine. Semantics: `meercat/dendrogram_purity.py:64-84` with
  // the float per-pair mean replaced by the scaled-integer sum (the
  // same trick the a2 B³ oracle uses).
  val h6GrinchPurityInt: Q = (s, dir) => {
    val emb = Tables.load(s, dir, "embeddings").where(col("vec_id") < H5N)
    val maxAbs = emb.agg(max(aggregate(col("embedding"), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double")))))).collect()(0).getDouble(0)
    val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
    val qdf = emb.select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") / lit(scale)).cast("long")).as("q"),
      col("label"))
    val tree = Grinch.dendrogram(qdf, col("vec_id"), col("q"), col("vec_id"), col("label"), IntP)
    val rows = tree.select(col("uid").cast("string"), col("parent_uid").cast("string"),
        col("label").cast("string")).limit(2 * H5N).collect()
    // size guard: the driver collect here is bounded by construction at
    // 2·H5N-1 nodes (vec_id < H5N, no graft ⇒ no lazy-deleted extras);
    // fail loudly rather than silently folding a truncated tree if H5N
    // ever grows past what a driver fold should hold.
    require(rows.length < 2 * H5N,
      s"h6 tree unexpectedly has >= ${2 * H5N} nodes; route through Trees.purityAuto instead")
    val nodes = rows
      .map(r => Trees.TreeNode(r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
      .toSeq
    val (summand, pStar) = Trees.dendrogramPurityFixedPoint(nodes)
    import s.implicits._
    Seq((summand.toDouble / (1000000000.0 * pStar.toDouble), summand, pStar))
      .toDF("purity", "fp_summand", "total_pairs")
  }

  val h6GrinchPurityIntSql: String =
    s"""WITH RECURSIVE $intTreeCtes,
       |lv AS (SELECT uid, label FROM tree WHERE label IS NOT NULL),
       |anc(leaf, node) AS (
       |  SELECT uid, uid FROM lv
       |  UNION ALL
       |  SELECT a.leaf, t.parent_uid FROM anc a
       |  JOIN tree t ON a.node = t.uid WHERE t.parent_uid IS NOT NULL),
       |hist AS (
       |  SELECT a.node AS node, l.label AS label, count(*)::BIGINT AS cnt
       |  FROM anc a JOIN lv l ON l.uid = a.leaf GROUP BY 1, 2),
       |nv AS (SELECT node, cast(sum(cnt) AS BIGINT) AS n_v FROM hist GROUP BY 1),
       |cp AS (
       |  SELECT t.parent_uid AS v, h.label AS label,
       |         cast(sum(h.cnt * (h.cnt - 1) // 2) AS BIGINT) AS cpairs
       |  FROM tree t JOIN hist h ON h.node = t.uid
       |  WHERE t.parent_uid IS NOT NULL GROUP BY 1, 2),
       |contrib AS (
       |  SELECT ((h.cnt * (h.cnt - 1) // 2) - coalesce(cp.cpairs, 0))
       |           * ((h.cnt * 1000000000) // nv.n_v) AS c
       |  FROM hist h JOIN nv ON nv.node = h.node
       |  LEFT JOIN cp ON cp.v = h.node AND cp.label = h.label),
       |sm AS (SELECT cast(sum(c) AS BIGINT) AS fp_summand FROM contrib),
       |ps AS (
       |  SELECT cast(sum(c * (c - 1) // 2) AS BIGINT) AS total_pairs
       |  FROM (SELECT count(*)::BIGINT AS c FROM lv GROUP BY label))
       |SELECT fp_summand::DOUBLE / (1000000000.0::DOUBLE * total_pairs::DOUBLE) AS purity,
       |       fp_summand, total_pairs
       |FROM sm, ps""".stripMargin

  val queries: Map[String, Q] = Map(
    "h1_grinch_flat" -> h1GrinchFlat,
    "h2_grinch_dendrogram" -> h2GrinchDendrogram,
    "h3_grinch_purity" -> h3GrinchPurity,
    "h4_grinch_by_label" -> h4GrinchByLabel,
    "h5_grinch_int_tree" -> h5GrinchIntTree,
    "h6_grinch_purity_int" -> h6GrinchPurityInt)

  val oracles: Map[String, String] = Map(
    "h5_grinch_int_tree" -> h5GrinchIntTreeSql,
    "h6_grinch_purity_int" -> h6GrinchPurityIntSql)
}
