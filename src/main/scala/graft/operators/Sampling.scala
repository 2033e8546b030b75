package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A13 — triplet (anchor-positive, positive, negative) sampling for
  * attentional-pooling / metric-learning training
  * (`/root/reference/meercat/utils.py:199-249`): bucket rows by entity;
  * every entity with ≥2 rows yields one triplet of two of its own rows
  * plus one row of a different entity.
  *
  * The reference samples with `random.*`; here selection is
  * deterministic pseudo-randomness — rows are ranked inside their
  * bucket by a seeded mod-p hash of their id, and the negative entity
  * is the hash-argmin over the OTHER entities — so results are
  * reproducible across runs and partitionings (a requirement the
  * reference's in-memory RNG can't meet distributed). Distribution-wise
  * it is the same "uniform-ish pick" at a fixed seed. Both hashes are
  * engine-portable mod-p arithmetic (the row hash is a Knuth
  * multiplicative mix of the id, the entity hash is [[graft.functions
  * .PolyHash]] of the entity rendered as a string), so the whole
  * operator is reproducible by an ANSI-SQL oracle.
  *
  * Scale: two hash-window passes over the bucketed rows + one
  * broadcast-sized join on the entity dimension; no shuffles beyond the
  * entity key.
  */
object Sampling {
  private val P = 1000000007L

  /** Deterministic stratified sampling — the data-mixing primitive of a
    * training-data pipeline: each stratum (domain/language/source) keeps
    * a configured percentage of its rows, selected by a seeded integer
    * hash of the row id rather than an RNG, so the sample is
    * reproducible across runs, partitionings, AND engines (the oracle
    * recomputes the same hash). keep ⇔ hash(id) mod 100 < rate(stratum).
    *
    * Scale: a pure map-side filter — no shuffle, no state; the rate
    * table is a literal CASE. At 100 TB this is the difference between
    * sampling-by-scan and sampling-by-sort.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
                       rates: Map[String, Int], defaultRate: Int,
                       seed: Long = 42L): DataFrame = {
    val h = ((((id.cast("long") % P) * 2654435761L + seed) % P + P) % P) % 100L
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    df.where(h < rate)
  }

  /** Deterministic per-stratum quota sampling — the other data-mixing
    * primitive: keep EXACTLY k rows per stratum (language/domain/source
    * budget), chosen by seeded-hash order rather than an RNG, so the
    * quota is reproducible across runs, partitionings, and engines.
    * rank(id) inside stratum by (hash(id), id); keep rank ≤ k.
    *
    * Scale: the rank ≤ k filter over a row_number window is rewritten by
    * Spark's `InferWindowGroupLimit` into a `WindowGroupLimit` — each
    * map task keeps only its local top-k per stratum BEFORE the
    * stratum-key shuffle, so the exchange carries O(#strata × k) rows,
    * not the corpus. (Asserted in QualitySpec against the physical
    * plan.) One shuffle on the stratum key; no global sort.
    */
  def quotaSample(df: DataFrame, stratum: Column, id: Column,
                  k: Int, seed: Long = 7L): DataFrame = {
    // reduce id mod P before the multiply so the product stays well
    // inside int64 (DuckDB errors on bigint overflow where Spark wraps)
    val h = (((id.cast("long") % P) * 2654435761L + seed) % P + P) % P
    val w = Window.partitionBy(stratum).orderBy(h.asc, id.asc)
    df.withColumn("_qrn", row_number().over(w))
      .where(col("_qrn") <= k)
      .drop("_qrn")
  }

  /** Deterministic global uniform k-sample — the reservoir-sampling
    * primitive of a training-data pipeline ("give me exactly k docs,
    * uniformly"), re-expressed so it distributes AND streams: keep the
    * k rows with the SMALLEST seeded hash of their id (ties by id).
    * At a fixed seed the hash order is a uniform-ish permutation, so
    * bottom-k by hash ≡ a uniform k-sample, but — unlike an RNG
    * reservoir — the selection is reproducible across runs,
    * partitionings, and engines (the oracle recomputes the hash).
    *
    * Scale: bottom-k is MERGEABLE (the bottom-k of a union is the
    * bottom-k of the parts' bottom-k's), so `orderBy(h).limit(k)`
    * compiles to TakeOrderedAndProject — each partition forwards only
    * its own k rows and the driver merges #partitions × k, never a
    * global sort (asserted in QualitySpec). The same merge law gives
    * the streaming twin (st21) exactly k rows of state and
    * batching-independent results.
    */
  def bottomKSample(df: DataFrame, id: Column, k: Int, seed: Long = 11L): DataFrame = {
    val h = (((id.cast("long") % P) * 2654435761L + seed) % P + P) % P
    df.withColumn("_bh", h)
      .orderBy(col("_bh").asc, id.asc)
      .limit(k)
      .drop("_bh")
  }

  /** Deterministic temperature-scaled source mixing (T = 2) — the
    * corpus-rebalancing recipe LLM pipelines run before training (the
    * Pile/ROOTS-style resampling): target share of source i ∝
    * n_i^(1/T), so small sources are up-weighted relative to their raw
    * share, and each document keeps with per-source rate
    * r_i = keepFrac · tot · √n_i / (Σ√n · n_i) (per-myriad integer),
    * selected by the same seeded id hash as p10 — reproducible across
    * runs, partitionings, and engines.
    *
    * Engine-exactness of the float math: √ is IEEE-correctly-rounded
    * on both engines, and Σ√n runs as a LEFT FOLD over sources in
    * source-name order on both sides (order pinned — double addition
    * is not associative), so the derived integer rates are
    * bit-identical. The rate table is #sources rows computed on the
    * driver (bounded, like p10's literal CASE) and joined broadcast;
    * the keep test is a pure map-side filter.
    */
  def temperatureMix(df: DataFrame, source: Column, id: Column,
                     keepFrac: Double, seed: Long = 17L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // reserved temp names so the rate-table join can't capture a
    // caller column (fail fast instead of an ambiguous-reference or,
    // worse, a silently wrong join)
    val reserved = Seq("_tm_src", "rate").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"temperatureMix reserves columns ${reserved.mkString(", ")}; rename them in the input")
    val counts = df.groupBy(source.as("_tm_src")).agg(count(lit(1)).as("_tm_n"))
      .as[(String, Long)].collect().sortBy(_._1)
    val tot = counts.map(_._2).sum
    val sw = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + math.sqrt(n.toDouble) }
    val rates = counts.map { case (s, n) =>
      (s, (10000.0 * (keepFrac * tot) * math.sqrt(n.toDouble) / (sw * n)).round)
    }.toSeq.toDF("_tm_src", "rate")
    val h = (((id.cast("long") % P) * 2654435761L + seed) % P + P) % P
    df.join(broadcast(rates), source === col("_tm_src"))
      .where(h % 10000L < col("rate"))
      .drop("_tm_src")
  }

  def tripletSample(df: DataFrame, entity: Column, id: Column, seed: Long = 42L): DataFrame = {
    // reduce rid mod P before the multiply so the product stays well
    // inside int64 — DuckDB errors on bigint overflow where Spark wraps
    val h = (((col("rid") % P) * 2654435761L + seed) % P + P) % P
    val w = Window.partitionBy(col("e")).orderBy(h, col("rid"))
    val ranked = df.select(entity.as("e"), id.cast("long").as("rid"))
      .withColumn("rk", row_number().over(w))
      .withColumn("bucket_size", count(lit(1)).over(Window.partitionBy(col("e"))))
    // two positives from every multi-mention bucket
    val pos = ranked.where(col("bucket_size") >= 2 && col("rk") <= 2)
      .groupBy(col("e")).agg(
        min(when(col("rk") === 1, col("rid"))).as("pos_1"),
        min(when(col("rk") === 2, col("rid"))).as("pos_2"))
    // negative entity: hash-argmin over the other entities. The argmin
    // over "all but me" is the GLOBAL top-2 by (hash, entity) — top-1
    // unless that is the anchor itself — so this is a distributed
    // top-k (TakeOrdered) + a broadcast 1-row cross join, O(#entities),
    // never the O(E²) anchors×entities non-equi join.
    val ents = ranked.select(col("e")).distinct()
      .withColumn("eh",
        (graft.functions.TextFunctions.stringHash(col("e").cast("string")) + seed) % P)
    val top2 = ents.select(col("e").as("ne"), col("eh"))
      .orderBy(col("eh"), col("ne")).limit(2)
      .withColumn("rk", row_number().over(Window.orderBy(col("eh"), col("ne"))))
      .groupBy().agg(
        min(when(col("rk") === 1, col("ne"))).as("ne1"),
        min(when(col("rk") === 2, col("ne"))).as("ne2"))
    val negPick = pos.select(col("e")).crossJoin(broadcast(top2))
      .select(col("e"),
        when(col("e") =!= col("ne1"), col("ne1")).otherwise(col("ne2")).as("ne"))
      .where(col("ne").isNotNull)
    // negative row: the bucket's rank-1 row
    val negRow = ranked.where(col("rk") === 1).select(col("e").as("ne"), col("rid").as("neg"))
    pos.join(negPick, "e").join(negRow, "ne")
      .select(col("e").as("entity"), col("pos_1"), col("pos_2"),
        col("ne").as("neg_entity"), col("neg"))
  }
}
