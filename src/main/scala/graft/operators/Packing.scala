package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step every LLM training
  * pipeline runs last: documents are concatenated in a deterministic
  * shuffled order and the token stream is chunked into fixed-length
  * training sequences of `seqLen` tokens, so each document lands at a
  * reproducible `[tok_start, tok_end)` interval of its shard's stream
  * and spans sequences `first_seq..last_seq`.
  *
  * Distributed shape: a single global stream would need a global sort,
  * so the pack is per-SHARD — each document is routed to one of
  * `shards` writer shards by a seeded mod-p hash of its id (the same
  * Knuth-mix hash as the sampling ops p10-p12, so the oracle replays
  * the routing), ordered within its shard by (hash, id), and offsets
  * come from one running-sum window PARTITIONED BY shard. That is the
  * real pipeline topology: one writer task per shard packs its own
  * stream independently; at 100 TB you size `shards` to the output
  * file count and every window sort is one task's worth of rows, never
  * the corpus. All arithmetic is non-negative int64, so the chunk
  * assignment (`div seqLen`) is exact floor division on both engines.
  */
object Packing {
  private val P = 1000000007L

  /** p14 — pack documents into fixed-length training sequences.
    *
    * Output, one row per document:
    * `(doc_id, shard, tok_start, tok_end, first_seq, last_seq)` where
    * `[tok_start, tok_end)` is the document's interval in its shard's
    * concatenated token stream and `first_seq/last_seq` are the
    * `seqLen`-token chunks it overlaps (a document crossing a chunk
    * boundary spans several — the usual cross-document attention
    * masking decision is downstream of this map).
    *
    * Zero-token documents occupy an empty interval: they get
    * `tok_start = tok_end` and `first_seq = last_seq = tok_start div
    * seqLen` (the chunk they would have landed in).
    */
  def packSequences(df: DataFrame, id: Column, nTokens: Column,
                    shards: Int, seqLen: Int, seed: Long = 23L): DataFrame = {
    require(shards > 0 && seqLen > 0, s"shards=$shards seqLen=$seqLen must be positive")
    val h = (((id.cast("long") % P) * 2654435761L + seed) % P + P) % P
    val base = df.select(
      id.cast("long").as("doc_id"),
      nTokens.cast("long").as("_ntok"),
      h.as("_h"),
      (h % shards).as("shard"))
    // explicit ROWS frame: the default RANGE frame makes duplicate ids
    // window PEERS (both rows would get the same tok_end — overlapping
    // intervals, diverging from the SQL oracle's ROWS frame and the
    // streaming fold); with ROWS, rows accumulate one at a time. Ids
    // are expected unique — with duplicates the intra-peer order (and
    // so the interval split between the copies) is partition-dependent.
    val w = Window.partitionBy(col("shard")).orderBy(col("_h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tokEnd = sum(col("_ntok")).over(w)
    base
      .withColumn("tok_end", tokEnd)
      .withColumn("tok_start", col("tok_end") - col("_ntok"))
      // `div` is int64 floor division for the non-negative offsets here
      // (expr() because Column has no integer-division method)
      .select(
        col("doc_id"), col("shard"), col("tok_start"), col("tok_end"),
        expr(s"tok_start div $seqLen").as("first_seq"),
        expr(s"greatest(tok_start, tok_end - 1) div $seqLen").as("last_seq"))
  }
}
