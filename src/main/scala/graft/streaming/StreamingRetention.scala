package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort retention — the w5 activation/retention matrix as
  * an INGEST-TIME operator: per-user state is TWO longs (the cohort
  * day and a bitmask of day offsets already counted), and each batch
  * emits one (cohort_day, day_offset) hit per NEWLY seen offset per
  * user — emission ∝ changes (the st8 delta-emission discipline), and
  * a plain count over the sink equals the batch w5 matrix, so st22
  * hash-matches the same SQL oracle.
  *
  * Preconditions (the harness's contract, same as st9/st20): events
  * arrive ts-ascending, so a user's first-ever event fixes the cohort
  * day. The bitmask bounds the tracked window at 63 offsets — ample
  * for the 30-day retention matrices pipelines report; a longer
  * horizon would swap the mask for a bounded sorted Seq without
  * changing the operator shape.
  */
object StreamingRetention {

  /** One observation: user was active on `day` (integer day number). */
  final case class DayEvent(userId: Long, day: Long)

  /** Keyed state: cohort day + bitmask of already-emitted offsets. */
  final case class UserDays(cohortDay: Long, mask: Long)

  /** One newly-counted (cohort, offset) cell hit. */
  final case class OffsetHit(cohortDay: Long, dayOffset: Long)

  implicit private val stEnc: Encoder[UserDays] = Encoders.product[UserDays]
  implicit private val outEnc: Encoder[OffsetHit] = Encoders.product[OffsetHit]

  def cohortOffsets(events: Dataset[DayEvent]): Dataset[OffsetHit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[DayEvent], state: GroupState[UserDays]) =>
          val evs = batch.toArray
          val st0 = state.getOption.getOrElse(UserDays(evs.iterator.map(_.day).min, 0L))
          var mask = st0.mask
          val fresh = Array.newBuilder[OffsetHit]
          evs.foreach { e =>
            val off = e.day - st0.cohortDay
            if (off >= 0 && off < 63) {
              val bit = 1L << off
              if ((mask & bit) == 0L) { mask |= bit; fresh += OffsetHit(st0.cohortDay, off) }
            }
          }
          state.update(UserDays(st0.cohortDay, mask))
          fresh.result().iterator
      }
  }
}
