package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming connected components — duplicate-group assembly (d7) as an
  * INGEST-TIME operator: verified near-dup pair events fold into a keyed
  * union-find, so the canonical-document map stays current as a corpus
  * lands instead of re-running the batch label propagation.
  *
  * Union by MIN ROOT: merging always reparents the larger root onto the
  * smaller, so a component's representative is its minimum node id —
  * exactly the batch operator's (`Dedup.connectedComponents`) canonical
  * choice, and ORDER-INDEPENDENT: whatever order edges arrive in, the
  * final assignment equals the batch result, which is why st8
  * hash-matches d7's recursive-CTE oracle.
  *
  * Each micro-batch emits the full current assignment stamped with a
  * step counter (append mode can't retract: a later edge may merge two
  * existing components and relabel nodes, so readers take the max-step
  * row per node — the same convention as the streaming GRINCH query).
  * State is one parent pointer per node of the PAIR GRAPH (duplicate
  * docs only, not the corpus). The `key` field partitions independent
  * graphs (shards/datasets); one key = one global graph.
  */
object StreamingComponents {

  /** One undirected pair event; `seq` orders arrivals within a batch. */
  final case class EdgeEvent(key: Long, seq: Long, a: Long, b: Long)

  /** Keyed state: parent pointers (roots map to themselves) + batch
    * step counter.
    */
  final case class UfState(parent: Map[Long, Long], step: Long)

  /** One node's assignment as of `step`. */
  final case class NodeComp(step: Long, node: Long, comp: Long)

  implicit private val stateEnc: Encoder[UfState] = Encoders.product[UfState]
  implicit private val outEnc: Encoder[NodeComp] = Encoders.product[NodeComp]

  def connectedComponents(events: Dataset[EdgeEvent]): Dataset[NodeComp] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[EdgeEvent], state: GroupState[UfState]) =>
          val parent = mutable.HashMap.empty[Long, Long]
          state.getOption.foreach(s => parent ++= s.parent)
          def find(x: Long): Long = {
            var r = x
            while (parent(r) != r) r = parent(r)
            // path compression: re-walk and point everything at the root
            var c = x
            while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
            r
          }
          batch.toSeq.sortBy(_.seq).foreach { e =>
            parent.getOrElseUpdate(e.a, e.a)
            parent.getOrElseUpdate(e.b, e.b)
            val ra = find(e.a)
            val rb = find(e.b)
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          val step = state.getOption.map(_.step).getOrElse(0L) + 1
          state.update(UfState(parent.toMap, step))
          parent.keysIterator.toSeq.sorted
            .map(n => NodeComp(step, n, find(n))).iterator
      }
  }
}
