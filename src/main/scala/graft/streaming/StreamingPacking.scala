package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — p14's concat-and-chunk as an INGEST-TIME
  * operator: documents stream in and each is assigned its [tok_start,
  * tok_end) interval of its shard's concatenated token stream, plus the
  * seqLen-chunks it spans, the moment it arrives.
  *
  * Offsets are PREFIX-STABLE: a document's interval depends only on the
  * tokens packed before it in its shard, so append mode needs no
  * retraction and the streamed assignment equals the batch window
  * recompute row for row (st23 hash-matches p14's SQL oracle). Keyed
  * state per shard is ONE long (the running token offset) — constant
  * size, unlike the batch window which must sort the shard's rows.
  *
  * Order contract: documents must arrive in (hash, doc_id) order per
  * shard — the same total order the batch window's ORDER BY encodes
  * (the deterministic shuffled pack order). Within a micro-batch the
  * fold re-sorts; across batches the feed must be ascending, exactly
  * like st9's ts-ordered contract.
  */
object StreamingPacking {

  /** One document routed to `shard`; `h` is its seeded pack-order hash. */
  final case class PackEvent(shard: Long, docId: Long, h: Long, nTok: Long)

  /** Per-shard state: the running end-of-stream token offset. */
  final case class PackState(tokEnd: Long)

  final case class PackOut(docId: Long, shard: Long, tokStart: Long,
                           tokEnd: Long, firstSeq: Long, lastSeq: Long)

  implicit private val stateEnc: Encoder[PackState] = Encoders.product[PackState]
  implicit private val outEnc: Encoder[PackOut] = Encoders.product[PackOut]

  def pack(events: Dataset[PackEvent], seqLen: Int): Dataset[PackOut] = {
    require(seqLen > 0, s"seqLen=$seqLen must be positive")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, batch: Iterator[PackEvent], state: GroupState[PackState]) =>
          var end = state.getOption.map(_.tokEnd).getOrElse(0L)
          val out = batch.toSeq.sortBy(e => (e.h, e.docId)).map { e =>
            val start = end
            end = start + e.nTok
            PackOut(e.docId, shard, start, end,
              start / seqLen, math.max(start, end - 1) / seqLen)
          }
          state.update(PackState(end))
          out.iterator
      }
  }
}
