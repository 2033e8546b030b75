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

  val queries: Map[String, Q] = Map(
    "h1_grinch_flat" -> h1GrinchFlat,
    "h2_grinch_dendrogram" -> h2GrinchDendrogram,
    "h3_grinch_purity" -> h3GrinchPurity,
    "h4_grinch_by_label" -> h4GrinchByLabel)

  val oracles: Map[String, String] = Map.empty
}
