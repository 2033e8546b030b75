package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Grinch

/** Structured Streaming mode of the GRINCH tree automaton (SURVEY §2.4;
  * the C11-C17 twin of [[StreamingClustering]]): one evolving
  * hierarchical clustering per key behind `flatMapGroupsWithState`.
  *
  * State design: the automaton's node-id layout pins leaf ids to
  * [0, n) with internal ids above them (`grinch_alg.py:60-77` does the
  * same with numpy arrays sized by n), so a live tree cannot absorb new
  * points without renumbering every parent/child reference. The keyed
  * state is therefore the INSERTION LOG, and restore = deterministic
  * replay — which is exactly the online algorithm itself, so streaming
  * and batch trees are identical by construction, not just equivalent.
  * `activeLeafLimit` bounds each insert's 1-NN scan; the log (like the
  * reference's input array) grows with the stream.
  *
  * Unlike greedy NN-threshold ids, GRINCH cluster memberships can
  * change as the tree rotates/grafts, so each micro-batch re-emits the
  * key's FULL current flat clustering stamped with a monotone `step`
  * (= points inserted so far); consumers keep the max-step row per id.
  */
object StreamingGrinch {

  /** One input point of a keyed stream. */
  final case class PointEvent(key: Long, id: Long, order: Long, vec: Array[Float])

  /** Keyed state: insert order is list order. */
  final case class TreeLog(entries: List[(Long, Array[Float])])

  /** One assignment row; `step` orders re-emissions of the same id. */
  final case class TreeAssignment(key: Long, id: Long, predCluster: Long, step: Long)

  /** One dendrogram node row (uids are the automaton's: leaf = stream
    * position, internal above n); `step` orders re-emissions.
    */
  final case class TreeRow(key: Long, uid: Long, parentUid: Option[Long], step: Long)

  implicit private val logEnc: Encoder[TreeLog] = Encoders.product[TreeLog]
  implicit private val outEnc: Encoder[TreeAssignment] = Encoders.product[TreeAssignment]
  implicit private val rowEnc: Encoder[TreeRow] = Encoders.product[TreeRow]

  /** Apply to a streaming (or batch) Dataset[PointEvent]; emits the
    * refreshed flat clustering of each touched key per micro-batch.
    */
  /** The evolving DENDROGRAM of each key: every micro-batch re-emits
    * the key's full current (uid, parent) relation stamped with the
    * step; consumers keep the max-step row per uid. Same replay-log
    * state as [[flatCluster]] — the final tree is the batch tree by
    * construction, so under the h5 restricted integer config the
    * max-step output hash-matches h5's closed-form SQL oracle.
    */
  def dendrogram(events: Dataset[PointEvent], p: Grinch.Params): Dataset[TreeRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[PointEvent], state: GroupState[TreeLog]) =>
          val prior = state.getOption.map(_.entries).getOrElse(Nil)
          val incoming = batch.toSeq.sortBy(_.order).map(e => (e.id, e.vec))
          val log = prior ++ incoming
          state.update(TreeLog(log))
          if (log.isEmpty) Iterator.empty
          else {
            val g = Grinch.buildFrom(log.map(_._2).toArray, p)
            val step = log.length.toLong
            g.treeNodes(_ => None).iterator.map(t =>
              TreeRow(key, t.uid.toLong, t.parentUid.map(_.toLong), step))
          }
      }
  }

  def flatCluster(events: Dataset[PointEvent], p: Grinch.Params,
                  threshold: Double): Dataset[TreeAssignment] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[PointEvent], state: GroupState[TreeLog]) =>
          val prior = state.getOption.map(_.entries).getOrElse(Nil)
          val incoming = batch.toSeq.sortBy(_.order).map(e => (e.id, e.vec))
          val log = prior ++ incoming
          state.update(TreeLog(log))
          if (log.isEmpty) Iterator.empty
          else {
            val g = Grinch.buildFrom(log.map(_._2).toArray, p)
            val assign = g.flatClustering(threshold)
            val step = log.length.toLong
            log.iterator.zipWithIndex.map { case ((id, _), i) =>
              TreeAssignment(key, id, assign(i).toLong, step)
            }
          }
      }
  }
}
