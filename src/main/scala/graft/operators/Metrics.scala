package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coreference-evaluation metric suite (SURVEY.md §2.5 A1-A4) over a
  * cluster-assignment relation: one row per element with a true-cluster
  * column and a predicted-cluster column. All metrics are label-invariant
  * (`/root/reference/tests/eval_clusters_test.py:7-8`).
  *
  * Scale design: every metric reduces the input with key-partitioned hash
  * aggregations (map-side partials, one shuffle on the cluster key); the
  * only non-distributed step is CEAF-e's optimal matching, which runs on
  * the #true×#pred cluster-level matrix — clusters ≪ elements, mirroring
  * the reference's own sparse-matrix shortcut
  * (`meercat/eval_clusters.py:101-112`).
  *
  * Oracle-exactness: MUC emits single divisions of exact longs (with the
  * reference's +1e-13 epsilons, `meercat/eval_clusters.py:54,66,70`);
  * B³'s per-element fraction sum — the one inherently rational reduction —
  * is computed in scaled integer arithmetic (see [[bCubed]]) so the
  * result is order-independent and bit-identical across engines.
  */
object Metrics {

  /** A1 — MUC precision/recall/F1 (`meercat/eval_clusters.py:44-74`).
    *
    * P = Σ_pred (|c| − #true partitions hit) / Σ_pred (|c| − 1), R is the
    * mirror image, F1 the harmonic mean; denominators carry the
    * reference's +1e-13.
    */
  def muc(df: DataFrame, trueCol: Column, predCol: Column): DataFrame = {
    val p = df.groupBy(predCol.as("c"))
      .agg(count(lit(1)).as("sz"), countDistinct(trueCol).as("parts"))
      .agg(sum(col("sz") - col("parts")).as("pn"), sum(col("sz") - 1).as("pd"))
    val r = df.groupBy(trueCol.as("c"))
      .agg(count(lit(1)).as("sz"), countDistinct(predCol).as("parts"))
      .agg(sum(col("sz") - col("parts")).as("rn"), sum(col("sz") - 1).as("rd"))
    val prec = col("pn").cast("double") / (col("pd").cast("double") + lit(1e-13))
    val rec = col("rn").cast("double") / (col("rd").cast("double") + lit(1e-13))
    p.crossJoin(r).select(
      prec.as("muc_p"),
      rec.as("muc_r"),
      (lit(2.0) * prec * rec / (prec + rec + lit(1e-13))).as("muc_f1"))
  }

  /** Fixed-point scale for B³'s fraction sum: contributions are summed as
    * `(c²·SCALE) div clusterSize` longs, making the reduction exact and
    * order-independent (a naive double sum is partition-order-dependent).
    * Error vs the real-valued metric is < #pairs·1e-9.
    */
  val B3Scale: Long = 1000000000L

  /** A2 — B³ precision/recall/F1 (`meercat/eval_clusters.py:77-98`).
    *
    * Per element: |true∩pred|/|pred| (precision) and /|true| (recall),
    * averaged over all elements. Grouping by the (true,pred) pair turns
    * the per-element sum into Σ_pairs c²/size — three hash aggregations
    * and two broadcast-sized joins on cluster ids.
    */
  def bCubed(df: DataFrame, trueCol: Column, predCol: Column): DataFrame = {
    val pairs = df.groupBy(trueCol.as("t"), predCol.as("p")).agg(count(lit(1)).as("c"))
    val psz = pairs.groupBy(col("p")).agg(sum("c").as("ps"))
    val tsz = pairs.groupBy(col("t")).agg(sum("c").as("ts"))
    val joined = pairs.join(psz, "p").join(tsz, "t")
    // c²·SCALE in decimal(38,0): a long product would overflow once a
    // (true,pred) pair exceeds ~3e6 rows — real at the 100 TB target.
    // DuckDB's c*c*SCALE promotes to HUGEINT and floor-divides the same.
    val agg = joined.agg(
      sum(expr(s"(cast(c as decimal(38,0)) * c * ${B3Scale}L) div ps")).as("pnum"),
      sum(expr(s"(cast(c as decimal(38,0)) * c * ${B3Scale}L) div ts")).as("rnum"),
      sum(col("c")).as("n"))
    val prec = col("pnum").cast("double") / (lit(B3Scale).cast("double") * col("n").cast("double"))
    val rec = col("rnum").cast("double") / (lit(B3Scale).cast("double") * col("n").cast("double"))
    agg.select(
      prec.as("b3_p"),
      rec.as("b3_r"),
      (lit(2.0) * prec * rec / (prec + rec)).as("b3_f1"))
  }

  /** A3 — CEAF-e (`meercat/eval_clusters.py:101-144`): cluster-level
    * φ4(k,r) = 2|k∩r|/(|k|+|r|), optimal 1:1 matching (Hungarian), then —
    * exactly as the reference divides — P = Σφ4/#true, R = Σφ4/#pred.
    *
    * The distributed part computes the sparse overlap triples
    * (true, pred, |∩|, |true|, |pred|); the matching runs on the driver
    * over the #clusters² matrix, like the reference's
    * `linear_sum_assignment` call.
    */
  def ceafE(df: DataFrame, trueCol: Column, predCol: Column): DataFrame = {
    val spark = df.sparkSession
    val pairs = df.groupBy(trueCol.as("t"), predCol.as("p")).agg(count(lit(1)).as("c"))
    val psz = pairs.groupBy(col("p")).agg(sum("c").as("ps"))
    val tsz = pairs.groupBy(col("t")).agg(sum("c").as("ts"))
    val triples = pairs.join(psz, "p").join(tsz, "t")
      .select(col("t").cast("string"), col("p").cast("string"), col("c"), col("ts"), col("ps"))
      .collect()

    // sorted ids: collect order varies with partitioning, and the final
    // total sums matched weights in column order — sorting makes the
    // float-sum order (hence the last ULP) run-deterministic
    val trueIds = triples.map(_.getString(0)).distinct.sorted.zipWithIndex.toMap
    val predIds = triples.map(_.getString(1)).distinct.sorted.zipWithIndex.toMap
    val nT = trueIds.size
    val nP = predIds.size
    val phi = Array.ofDim[Double](nT, nP)
    triples.foreach { r =>
      val i = trueIds(r.getString(0)); val j = predIds(r.getString(1))
      phi(i)(j) = 2.0 * r.getLong(2) / (r.getLong(3) + r.getLong(4))
    }
    val total = hungarianMax(phi)
    val prec = total / nT
    val rec = total / nP
    val f1 = 2 * prec * rec / (prec + rec)
    import spark.implicits._
    Seq((prec, rec, f1)).toDF("ceafe_p", "ceafe_r", "ceafe_f1")
  }

  /** Maximum-weight 1:1 assignment over a (possibly rectangular) dense
    * weight matrix; returns the optimal total weight. Classic O(n²m)
    * potential-based Hungarian algorithm on the minimization of −w,
    * equivalent to scipy's `linear_sum_assignment(maximize=True)` used at
    * `meercat/eval_clusters.py:137`. Rows are transposed to ensure
    * rows ≤ cols; unmatched columns contribute 0, matching scipy's
    * rectangular semantics for non-negative weights.
    */
  def hungarianMax(w: Array[Array[Double]]): Double = {
    if (w.isEmpty || w(0).isEmpty) return 0.0
    val (a, n, m) =
      if (w.length <= w(0).length) (w, w.length, w(0).length)
      else (w(0).indices.map(j => w.indices.map(i => w(i)(j)).toArray).toArray, w(0).length, w.length)
    // minimize cost = -weight
    val INF = Double.MaxValue / 4
    val u = new Array[Double](n + 1)
    val v = new Array[Double](m + 1)
    val p = new Array[Int](m + 1) // p(j) = row matched to column j (1-based; 0 = none)
    val way = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(m + 1)(INF)
      val used = new Array[Boolean](m + 1)
      var done = false
      while (!done) {
        used(j0) = true
        val i0 = p(j0)
        var delta = INF
        var j1 = -1
        var j = 1
        while (j <= m) {
          if (!used(j)) {
            val cur = -a(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= m) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
          j += 1
        }
        j0 = j1
        done = p(j0) == 0
      }
      while (j0 != 0) {
        val j1 = way(j0)
        p(j0) = p(j1)
        j0 = j1
      }
      i += 1
    }
    var total = 0.0
    var j = 1
    while (j <= m) {
      if (p(j) != 0) total += a(p(j) - 1)(j - 1)
      j += 1
    }
    total
  }

  /** A1+A2+A3+A6 summary row (`meercat/eval_clusters.py:196-219`): the
    * three F1s, their mean, cluster counts and the median true-cluster
    * size.
    *
    * Deliberate deviation: the reference's `eval_clusters.py:196`
    * computes `median(len(x) for x in true_clusters)` over the dict
    * KEYS — the median LENGTH OF THE CLUSTER-ID STRING, an upstream
    * bug. `median_true_size` here is the median true-cluster SIZE (the
    * evident intent), so this one field does not reproduce the
    * reference's printed number.
    */
  def evalSummary(df: DataFrame, trueCol: Column, predCol: Column): DataFrame = {
    val m = muc(df, trueCol, predCol)
    val b = bCubed(df, trueCol, predCol)
    val c = ceafE(df, trueCol, predCol)
    val census = df.groupBy(trueCol.as("t")).agg(count(lit(1)).as("sz"))
      .agg(
        count(lit(1)).cast("long").as("n_true_clusters"),
        median(col("sz")).cast("double").as("median_true_size"))
    val nPred = df.agg(countDistinct(predCol).cast("long").as("n_pred_clusters"))
    m.crossJoin(b).crossJoin(c).crossJoin(census).crossJoin(nPred)
      .withColumn("mean_f1", (col("muc_f1") + col("b3_f1") + col("ceafe_f1")) / 3.0)
  }
}
