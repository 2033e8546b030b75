package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational analytics pack (SURVEY.md §7.1 layer 2): generic
  * DataFrame operators re-expressing the reference's projection /
  * dictionary / split / census / window logic. Everything here is pure
  * declarative DataFrame code — Catalyst handles pushdown, partial aggs
  * and join selection; nothing is mention-specific.
  */
object Relational {

  /** P7 — dictionary encoding in first-occurrence order
    * (`/root/reference/meercat/baseline.py:76-83`,
    * `meercat/nn_thresh.py:160-174`): each distinct `key` gets a dense
    * 0-based code in order of its first appearance by `orderCol`.
    *
    * Scale design: the input is touched only by a key-partitioned hash
    * aggregation (one shuffle on key, map-side partials); the global
    * dense_rank runs on the *aggregated dictionary* — one row per
    * distinct key — so the single-partition window holds #keys rows, not
    * #input rows. The codes relation is then broadcast back onto the
    * fact table (vocabularies are dimension-sized).
    */
  def dictEncode(df: DataFrame, key: Column, orderCol: Column, out: String,
                 broadcastCodes: Boolean = true): DataFrame = {
    val codes = df
      .groupBy(key.as("_k"))
      .agg(min(orderCol).as("_first_seen"))
      .withColumn(out, dense_rank().over(Window.orderBy(col("_first_seen"))) - 1)
      .select(col("_k"), col(out))
    // vocabularies are usually dimension-sized → broadcast; pass false
    // when the key cardinality rivals the fact table (shuffle join).
    df.join(if (broadcastCodes) broadcast(codes) else codes, key === col("_k")).drop("_k")
  }

  /** P7 at vocabulary scale: when the key cardinality rivals the fact
    * table, the single-partition ranking window in [[dictEncode]] is
    * the bottleneck — this variant ranks the aggregated dictionary
    * with a RANGE-PARTITIONED sort + per-partition index offsets
    * (`zipWithIndex`: one extra job to count partitions), so no single
    * task ever holds the dictionary. Same codes as [[dictEncode]] when
    * `orderCol` is globally unique (the mention-index contract — with
    * unique order values dense_rank ≡ row_number ≡ sorted position).
    */
  def dictEncodeDistributed(df: DataFrame, key: Column, orderCol: Column, out: String): DataFrame = {
    val spark = df.sparkSession
    val codes = df.groupBy(key.as("_k")).agg(min(orderCol).as("_first_seen"))
    val keyField = codes.schema.head
    // key as sort tie-break: with a non-unique orderCol the rank order
    // (and thus the codes) would otherwise vary run to run
    val rankedRdd = codes.orderBy(col("_first_seen"), col("_k")).rdd.zipWithIndex()
      .map { case (row, idx) => org.apache.spark.sql.Row(row.get(0), idx) }
    val ranked = spark.createDataFrame(rankedRdd,
      org.apache.spark.sql.types.StructType(Seq(
        keyField.copy(name = "_k"),
        org.apache.spark.sql.types.StructField(out, org.apache.spark.sql.types.LongType, nullable = false))))
    df.join(ranked, key === col("_k")).drop("_k")
  }

  /** P6 — composite key (`meercat/oracle_wd.py:31`). Null-propagating
    * like SQL `a || '::' || b` (a null input nulls the key), unlike
    * concat_ws which silently skips nulls and can conflate ("x", null)
    * with ("x"). The '::' separator assumes it never occurs in values.
    */
  def compositeKey(a: Column, b: Column): Column = concat(a, lit("::"), b)

  /** C10 — oracle within-document clustering: predicted cluster =
    * dict-code of the (entity, document) pair (`meercat/oracle_wd.py:26-36`).
    */
  def oracleWithinDoc(df: DataFrame, entity: Column, doc: Column, orderCol: Column): DataFrame =
    dictEncode(df.withColumn("_wd", compositeKey(entity, doc)), col("_wd"), orderCol, "pred_cluster")
      .drop("_wd")

  /** C9 — exact string-match clustering (`meercat/string_match.py:20-28`):
    * cluster id = dict-code of the raw string in first-occurrence order.
    */
  def stringMatchCluster(df: DataFrame, mention: Column, orderCol: Column): DataFrame =
    dictEncode(df, mention, orderCol, "pred_cluster")

  /** A7 — seen/unseen split (`meercat/eval_clusters.py:10-25`,
    * `scripts/split_unseen.py`): semi-join keeps rows whose key appears
    * in `allowed`; anti-join keeps the rest. Broadcast when small.
    */
  def seen(df: DataFrame, allowed: DataFrame, key: String): DataFrame =
    df.join(allowed.select(key).distinct(), Seq(key), "left_semi")

  def unseen(df: DataFrame, allowed: DataFrame, key: String): DataFrame =
    df.join(allowed.select(key).distinct(), Seq(key), "left_anti")

  /** As-of join — for every left row, the payload of the LATEST right
    * row with the same key whose time is at-or-before the left row's
    * time (the temporal-dimension lookup Spark has no built-in operator
    * for). Composed from existing ops, scale-first: both sides union
    * into one relation (right rows tagged 0, left rows 1), ONE window
    * partitioned by key and ordered by (time, tag, tie) carries the
    * payload forward with `last(..., ignoreNulls)`, left rows filter
    * back out. One shuffle on the key — never a per-row range join, and
    * no broadcast requirement on either side. Ties at equal time:
    * right rows sort before left rows (at-or-before semantics) and the
    * LARGEST `tie` value wins among simultaneous right rows, making
    * results deterministic and engine-reproducible.
    *
    * Payload columns come back as `asof_<name>`, null when no right row
    * precedes the left row (left-outer semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: Column, rightTime: Column, tie: Column,
               payload: Seq[String]): DataFrame = {
    val lcols = left.columns.toSeq
    val meta = Seq("_t", "_tag", "_tie")
    // ALL payload columns ride in ONE struct through a single
    // last(ignoreNulls): per-column windows would mix fields from
    // different right rows whenever the picked row holds a NULL in one
    // payload column (that column alone would fall back to an older
    // row). The struct itself is non-null on every right row, so the
    // picked row's NULL fields stay NULL.
    val pType = org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
    val l = left.withColumn("_t", leftTime.cast("long"))
      .withColumn("_tag", lit(1))
      .withColumn("_tie", lit(Long.MaxValue))
      .withColumn("_p", lit(null).cast(pType))
    val r = lcols.filterNot(_ == key).foldLeft(
      right.withColumn("_t", rightTime.cast("long"))
        .withColumn("_tag", lit(0))
        .withColumn("_tie", tie.cast("long"))
        .withColumn("_p", struct(payload.map(col): _*))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (Seq(key) ++ lcols.filterNot(_ == key) ++ meta :+ "_p").map(col)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(cols: _*).unionByName(r.select(cols: _*))
      .withColumn("_pl", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .select((lcols.map(col) ++ payload.map(p => col(s"_pl.$p").as(s"asof_$p"))): _*)
  }

  /** Bucketized range join: probe rows (long sort key `tsCol`) against
    * intervals `[startCol, endCol)` with NO equi-key. Catalyst plans a
    * pure non-equi condition as BroadcastNestedLoopJoin (or cartesian)
    * — O(n·m) work plus a must-broadcast side, dead at 100 TB. Instead
    * each interval explodes to the fixed-width buckets it overlaps
    * (≤ len/width + 1 rows), each probe row computes its single bucket,
    * and the join becomes an EQUI-join on the bucket with the range
    * predicate left as a residual filter: one hash shuffle per side
    * (or a broadcast when the exploded interval side is small), AQE
    * skew-splittable, no nested loop anywhere. Pick `bucketWidth` near
    * the typical interval length so intervals land in ≤ 2 buckets;
    * occupancy per bucket — not corpus size — then drives join cost.
    *
    * Preconditions: sort keys are non-negative longs (epoch times —
    * `div` truncation = floor), probe/interval column names disjoint.
    * Empty or inverted intervals are dropped (end ≤ start matches
    * nothing under the half-open semantics; filtering them also keeps
    * `sequence` from generating a descending bucket range).
    *
    * OUTPUT-SIZE CONTRACT (VERDICT r17 #7): the result IS the true
    * containment-pair relation, so cost is bounded below by OUTPUT
    * volume — at k× probe density every interval contains k× more
    * probes and pair volume grows ~quadratically with data (j6
    * measured 63× wall at 100×, SCALE_100X_r17). No bucket width can
    * cut that: the pairs are real rows. Consumers that only aggregate
    * per interval must use [[rangeCountSumPrefix]] (2.1× at the same
    * 100×); consumers that DO need the pairs can bound the blast
    * radius with `maxPairsPerBucket` — when positive, the operator
    * pre-computes each side's per-bucket occupancy (two bounded,
    * timeline-sized aggregates) and FAILS FAST if any bucket would
    * emit more candidate pairs than the budget, instead of silently
    * launching a quadratic join (the d3b/maxBucket discipline, adapted
    * to a semantics-preserving guard: it never drops pairs, it refuses
    * runs whose output the caller has not sized for).
    *
    * EAGER when guarded (ADVICE r18): with `maxPairsPerBucket > 0` the
    * occupancy check runs AT CALL TIME — two bounded aggregations, a
    * bounded join, and a collect execute before this method returns,
    * and an over-budget timeline throws here rather than when the
    * caller first materializes the result. This is a deliberate
    * departure from the otherwise fully lazy operator API: the guard
    * exists to stop a quadratic join from ever being scheduled, so it
    * must run before the returned plan can be. `maxPairsPerBucket = 0`
    * (the default) stays fully lazy.
    */
  def rangeJoinBucketed(probe: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketWidth: Long, maxPairsPerBucket: Long = 0L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // fail fast on the comment-only preconditions: a violating caller
    // would otherwise get silently wrong joins (ambiguous residual
    // columns, clobbered temp buckets), not an error
    val overlap = probe.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"probe/interval column names must be disjoint, both have: ${overlap.mkString(", ")}")
    val reserved = (probe.columns ++ intervals.columns).toSet.intersect(Set("_pbkt", "_ibkt"))
    require(reserved.isEmpty,
      s"reserved temp columns already present: ${reserved.mkString(", ")}")
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("_ibkt", explode(sequence(
        expr(s"$startCol div ${bucketWidth}L"),
        expr(s"($endCol - 1) div ${bucketWidth}L"))))
    val pr = probe.withColumn("_pbkt", expr(s"$tsCol div ${bucketWidth}L"))
    if (maxPairsPerBucket > 0L) {
      // per-bucket candidate-pair bound = probe occupancy × interval
      // occupancy; both relations are timeline-sized (one row per
      // active bucket), so the check is two map-side-combined aggs +
      // one bounded join — never pair-sized
      val pc = pr.groupBy(col("_pbkt").as("_bkt")).agg(count(lit(1)).as("_pc"))
      val ic = iv.groupBy(col("_ibkt").as("_bkt")).agg(count(lit(1)).as("_ic"))
      val worst = pc.join(ic, "_bkt")
        .select(max_by(struct(col("_bkt"), (col("_pc") * col("_ic")).as("_pairs")),
          col("_pc") * col("_ic")).as("w"))
        .select(col("w._bkt"), col("w._pairs")).collect()(0)
      if (!worst.isNullAt(1))
        require(worst.getLong(1) <= maxPairsPerBucket,
          s"rangeJoinBucketed: bucket ${worst.getLong(0)} would emit up to " +
            s"${worst.getLong(1)} candidate pairs (> budget $maxPairsPerBucket); " +
            s"this operator materializes the true containment-pair relation — " +
            s"aggregate consumers should use rangeCountSumPrefix, pair consumers " +
            s"a narrower bucketWidth or a larger budget")
    }
    pr.join(iv, pr("_pbkt") === iv("_ibkt") &&
        col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_pbkt", "_ibkt")
  }

  /** Aggregation-pushdown range attribution: per-interval COUNT and
    * SUM of probe rows in `[start, end)` WITHOUT materializing the
    * probe×interval containment pairs. The pairs are the scale wall
    * [[rangeJoinBucketed]] pays when the consumer only wants an
    * aggregate: at k× probe density every interval contains k× more
    * probes, so pair volume — and wall — grows ~quadratically with
    * data (j6 measured 63× at 100×, SCALE_100X_r17) while the
    * aggregated output stays one row per interval. Deriving a
    * narrower bucket width cannot help there: containment pairs are
    * true rows of the unaggregated relation, so only pushing the
    * aggregation through the range predicate removes them. Classic
    * prefix sums do exactly that: with G(t) = (count, sum) over
    * probes with ts < t, each interval's answer is G(end) − G(start).
    *
    * Distributed shape (no pass is corpus-sized on a single
    * partition):
    *  1. probes and the two boundary rows per interval (sign −1 at
    *     start, +1 at end) bucket by `ts div bucketWidth` — one hash
    *     shuffle total;
    *  2. per-bucket probe totals aggregate with map-side partials;
    *     the EXCLUSIVE prefix over bucket totals runs on one row per
    *     active bucket (timeline-sized, not corpus-sized — the
    *     dictEncode argument) and broadcasts back;
    *  3. a within-bucket running (count, sum) window — boundaries
    *     sort BEFORE probes at equal ts, making `< t` strict, which
    *     yields exactly the half-open `[start, end)` semantics —
    *     hands each boundary G(t) = bucket prefix + in-bucket run;
    *  4. boundaries fold per interval id with their sign; intervals
    *     containing zero probes drop out (inner-join parity with
    *     [[rangeJoinBucketed]] + groupBy).
    * Output: (`idCol`, `cnt` BIGINT, `sum` BIGINT).
    *
    * Preconditions as [[rangeJoinBucketed]] (non-negative long keys,
    * half-open intervals, end ≤ start rows dropped); `valCol` must be
    * non-null on probe rows.
    */
  def rangeCountSumPrefix(probe: DataFrame, intervals: DataFrame,
      tsCol: String, valCol: String, idCol: String,
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val ev = probe.select(
      expr(s"$tsCol div ${bucketWidth}L").as("_bkt"),
      col(tsCol).cast("long").as("_ts"),
      lit(1).as("_typ"), lit(1L).as("_c"), col(valCol).cast("long").as("_v"),
      lit(null).cast("long").as("_id"), lit(0L).as("_sign"))
    val bounds = intervals.where(col(endCol) > col(startCol))
      .select(col(idCol).as("_id"), explode(array(
        struct(col(startCol).cast("long").as("t"), lit(-1L).as("s")),
        struct(col(endCol).cast("long").as("t"), lit(1L).as("s")))).as("_b"))
      .select(expr(s"_b.t div ${bucketWidth}L").as("_bkt"),
        col("_b.t").as("_ts"),
        lit(0).as("_typ"), lit(0L).as("_c"), lit(0L).as("_v"),
        col("_id"), col("_b.s").as("_sign"))
    val u = ev.unionByName(bounds)
    // exclusive prefix per bucket: one row per ACTIVE bucket (probe or
    // boundary), so the unpartitioned window is timeline-sized
    val wpre = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = u.groupBy("_bkt")
      .agg(sum(col("_c")).as("_bc"), sum(col("_v")).as("_bv"))
      .select(col("_bkt"),
        coalesce(sum(col("_bc")).over(wpre), lit(0L)).as("_pc"),
        coalesce(sum(col("_bv")).over(wpre), lit(0L)).as("_pv"))
    val wrun = Window.partitionBy(col("_bkt")).orderBy(col("_ts"), col("_typ"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.join(broadcast(pre), Seq("_bkt"))
      .withColumn("_rc", sum(col("_c")).over(wrun))
      .withColumn("_rv", sum(col("_v")).over(wrun))
      .where(col("_typ") === 0)
      .groupBy(col("_id").as(idCol))
      .agg(sum(col("_sign") * (col("_pc") + col("_rc"))).as("cnt"),
        sum(col("_sign") * (col("_pv") + col("_rv"))).as("sum"))
      .where(col("cnt") > 0)
  }

  /** Bucketized interval-overlap join: pairs (a, b) whose half-open
    * intervals `[aStart, aEnd) × [bStart, bEnd)` overlap — the
    * two-sided sibling of [[rangeJoinBucketed]], again with NO
    * equi-key, so naively a nested-loop join. Both sides explode to
    * the fixed-width buckets they cover and join on the bucket; the
    * residual keeps true overlaps. Because BOTH sides explode, an
    * overlapping pair would surface once per shared bucket — instead
    * of a post-join `distinct` (a second shuffle over the pair set),
    * the join keeps a pair only in the bucket containing
    * `max(aStart, bStart)`: the overlap's first instant lies inside
    * both intervals, so exactly one shared bucket satisfies it — each
    * pair is emitted exactly once with zero dedup work. Same 100 TB
    * shape as [[rangeJoinBucketed]]: one hash shuffle per side, AQE
    * skew-splittable, cost driven by per-bucket occupancy.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty,
      s"a/b column names must be disjoint, both have: ${overlap.mkString(", ")}")
    val reserved = (a.columns ++ b.columns).toSet.intersect(Set("_abkt", "_bbkt"))
    require(reserved.isEmpty,
      s"reserved temp columns already present: ${reserved.mkString(", ")}")
    def explodeBuckets(df: DataFrame, s: String, e: String, out: String) =
      df.where(col(e) > col(s)).withColumn(out, explode(sequence(
        expr(s"$s div ${bucketWidth}L"),
        expr(s"($e - 1) div ${bucketWidth}L"))))
    val av = explodeBuckets(a, aStart, aEnd, "_abkt")
    val bv = explodeBuckets(b, bStart, bEnd, "_bbkt")
    av.join(bv, av("_abkt") === bv("_bbkt") &&
        col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        av("_abkt") === expr(s"greatest($aStart, $bStart) div ${bucketWidth}L"))
      .drop("_abkt", "_bbkt")
  }

  /** Funnel analysis: per user, the earliest completion time of each
    * step prefix in `steps` — step i counts only when it happens
    * STRICTLY after some completion of steps 0..i-1 (the classic
    * ordered-sequence funnel). Emits one row per user with
    * `t_<step>_us` per step (null = never reached) and `stage` = the
    * completed prefix length.
    *
    * The sequential dependency is expressed with running-min windows
    * over a RANGE frame ending at `-1` — "all rows of this user
    * strictly earlier in time" — so simultaneous events can never
    * qualify on each other and the result is deterministic without a
    * tie-break column, on any engine, regardless of the order rows
    * with equal timestamps are scanned.
    *
    * 100 TB shape: ONE hash shuffle on the user key and one sort
    * carry every step (the chained windows share partitioning + order,
    * so Catalyst stacks them without extra exchanges), and the final
    * per-user aggregation reuses the same partitioning — funnel depth
    * adds window expressions, never passes over the data.
    */
  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelStages needs at least one step")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val staged = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      df.withColumn(s"_q$i",
        if (i == 0) when(col(typeCol) === step, col(tsCol))
        else when(col(typeCol) === step &&
          min(col(s"_q${i - 1}")).over(w).isNotNull, col(tsCol)))
    }
    val mins = steps.indices.map(i => min(col(s"_q$i")).as(s"t_${steps(i)}_us"))
    val stage = steps.indices
      .map(i => when(col(s"t_${steps(i)}_us").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    staged.groupBy(userCol)
      .agg(mins.head, mins.tail: _*)
      .withColumn("stage", stage.cast("long"))
  }

  /** A11 — positional split routing (60/20/20 by a global sort —
    * `scripts/preprocess_medmentions.py:100-114`). Emits a `split`
    * column.
    *
    * Scale design: a global `row_number` window would force the WHOLE
    * input through one partition (an empty window partition spec plans
    * as `Exchange SinglePartition` — the round-7 audit caught exactly
    * that here). Instead the global position comes the same way
    * [[dictEncodeDistributed]] ranks large vocabularies: a
    * range-partitioned sort (parallel) + `zipWithIndex` per-partition
    * offsets (one extra count job, no single task ever holds more than
    * one partition). The count needed for the 60/80 boundaries is a
    * scalar scan-count. Label arithmetic is bit-identical to the window
    * form: 1-based position compared against `bounds * n` in doubles.
    */
  def splitRouting(df: DataFrame, orderCols: Seq[Column],
                   bounds: (Double, Double) = (0.6, 0.8)): DataFrame = {
    val spark = df.sparkSession
    val n = df.count()
    val t1 = bounds._1 * n
    val t2 = bounds._2 * n
    val indexed = df.orderBy(orderCols: _*).rdd.zipWithIndex().map {
      case (row, idx) =>
        val pos = idx + 1 // 1-based, as row_number
        val label = if (pos <= t1) "train" else if (pos <= t2) "dev" else "test"
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ label)
    }
    spark.createDataFrame(indexed, df.schema.add("split",
      org.apache.spark.sql.types.StringType, nullable = false))
  }

  /** Distributed 0-based global row numbering: range-partitioned sort
    * (parallel) + RDD `zipWithIndex` per-partition offsets — the same
    * technique as [[splitRouting]] / dictEncodeDistributed, replacing a
    * partitionless `row_number().over(Window.orderBy(...))` (which
    * plans as `Exchange SinglePartition` and funnels every row through
    * one task). One extra count job; no single task ever holds more
    * than one partition.
    */
  def globalRowIndex(df: DataFrame, orderCols: Seq[Column], outCol: String): DataFrame = {
    val spark = df.sparkSession
    val indexed = df.orderBy(orderCols: _*).rdd.zipWithIndex().map {
      case (row, idx) => org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(indexed, df.schema.add(outCol,
      org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** A8 — max concurrently-active entities
    * (`/root/reference/meercat/max_active.py:6-29`): per entity take the
    * [min,max] index interval, sweep +1/-1 events in index order, report
    * the running-sum maximum. One hash agg + one global ordered window
    * over 2·#entities rows (tiny relative to the input).
    */
  def maxActive(df: DataFrame, entity: Column, idx: Column): DataFrame = {
    val spans = df.groupBy(entity.as("e"))
      .agg(min(idx).as("s"), max(idx).as("en"))
    val events = spans.select(col("s").as("pos"), lit(1L).as("delta"))
      .unionAll(spans.select((col("en") + 1).as("pos"), lit(-1L).as("delta")))
    val run = events.withColumn(
      "active",
      sum(col("delta")).over(
        Window.orderBy(col("pos"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    run.agg(max(col("active")).cast("long").as("max_active"))
  }

  /** A5 — conflated/divided error counts
    * (`meercat/eval_clusters.py:147-169`): Σ over pred clusters of
    * (distinct true − 1) and vice versa.
    */
  def conflatedDivided(df: DataFrame, trueCol: Column, predCol: Column): DataFrame = {
    val conflated = df.groupBy(predCol.as("p"))
      .agg((countDistinct(trueCol) - 1).as("extra"))
      .agg(sum("extra").cast("long").as("conflated"))
    val divided = df.groupBy(trueCol.as("t"))
      .agg((countDistinct(predCol) - 1).as("extra"))
      .agg(sum("extra").cast("long").as("divided"))
    conflated.crossJoin(divided)
  }

  /** A5 extended — error analysis (`meercat/error_analysis.py:41-126`):
    * the single most-conflated predicted cluster (max distinct true ids,
    * deterministic tie-break on the cluster key) with its top-k example
    * rows joined back.
    */
  def mostConflatedExamples(df: DataFrame, trueCol: Column, predCol: Column,
                            exampleOrd: Column, k: Int): DataFrame = {
    val worst = df.groupBy(predCol.as("p"))
      .agg(countDistinct(trueCol).as("n_true"))
      .orderBy(col("n_true").desc, col("p"))
      .limit(1)
    df.join(broadcast(worst), predCol === col("p"))
      .orderBy(exampleOrd)
      .limit(k)
  }

  /** A5 extended — the "most split" twin (`meercat/error_analysis.py:
    * 89-113`): the single TRUE cluster scattered across the most
    * predicted clusters (deterministic tie-break on the cluster key)
    * with its top-k example rows joined back.
    */
  def mostDividedExamples(df: DataFrame, trueCol: Column, predCol: Column,
                          exampleOrd: Column, k: Int): DataFrame = {
    val worst = df.groupBy(trueCol.as("t"))
      .agg(countDistinct(predCol).as("n_pred"))
      .orderBy(col("n_pred").desc, col("t"))
      .limit(1)
    df.join(broadcast(worst), trueCol === col("t"))
      .orderBy(exampleOrd)
      .limit(k)
  }

  /** A6/A10 — cluster census: #clusters, median cluster size, #singletons
    * (`meercat/eval_clusters.py:196-219`, `scripts/unique_entities.py:6-14`).
    */
  def clusterCensus(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("k")).agg(count(lit(1)).as("sz"))
      .agg(
        count(lit(1)).cast("long").as("n_clusters"),
        median(col("sz")).cast("double").as("median_size"),
        sum(when(col("sz") === 1, 1L).otherwise(0L)).cast("long").as("n_singletons"))

  /** A9 — frequency vocabulary (`scripts/preprocess_medmentions.py:69-75`):
    * counts per key, descending. The [PAD] row prepend is a writer concern
    * (see sources.VocabCsv).
    */
  def frequencyVocab(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("entity")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("entity"))
}
