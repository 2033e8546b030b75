package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parent-pointer dendrogram relation + tree analytics (SURVEY.md §1.1
  * "Dendrogram", §2.5 A4, §2.4 C18).
  *
  * A tree row is (uid, parentUid, label): root has parentUid == None,
  * leaves carry labels (`/root/reference/meercat/grinch_alg.py:597-610`,
  * `tests/fixtures/tree.tsv`). Trees are cluster-level structures —
  * #nodes ≈ 2·#leaves ≪ #input rows — so analytics run as driver-side
  * folds over the collected relation, the same asymmetry the reference
  * exploits (`meercat/dendrogram_purity.py:48-84`).
  */
object Trees {

  /** One dendrogram node: `label` is Some for labeled leaves. */
  final case class TreeNode(uid: String, parentUid: Option[String], label: Option[String])

  /** A4 — dendrogram purity (`meercat/dendrogram_purity.py:64-84`).
    *
    * Bottom-up label-histogram merge per internal node; each internal
    * node contributes, per label, (pairs whose LCA is this node) ×
    * (label purity of this node) = `hist_left[l]·hist_right[l] ·
    * hist[l]/n_leaves`; normalized by the total number of same-label
    * pairs. Assumes a binary tree, like the reference (its comment at
    * `dendrogram_purity.py:76`). `labels` optionally overrides/attaches
    * leaf labels by uid (the reference's metadata join,
    * `dendrogram_purity.py:34-45`).
    */
  def dendrogramPurity(nodes: Seq[TreeNode], labels: Map[String, String] = Map.empty): Double = {
    val children = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    val byUid = nodes.map(n => n.uid -> n).toMap
    var root: Option[String] = None
    nodes.foreach { n =>
      n.parentUid match {
        case Some(p) => children.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += n.uid
        case None    => root = Some(n.uid)
      }
    }
    require(root.isDefined, "dendrogram has no root (parentUid == None) row")

    val hist = mutable.HashMap.empty[String, mutable.HashMap[String, Long]]
    def histOf(uid: String): mutable.HashMap[String, Long] =
      hist.getOrElseUpdate(uid, mutable.HashMap.empty)

    // post-order: reversed pre-order stack traversal, as the reference's
    // reversed(list(traverse(root))) (`dendrogram_purity.py:66`)
    val order = mutable.ArrayBuffer.empty[String]
    val stack = mutable.Stack(root.get)
    while (stack.nonEmpty) {
      val uid = stack.pop()
      order += uid
      children.getOrElse(uid, Nil).foreach(stack.push)
    }

    var summand = 0.0
    order.reverseIterator.foreach { uid =>
      val kids = children.getOrElse(uid, Nil)
      require(kids.size <= 2,
        s"dendrogramPurity requires a binary tree; node $uid has ${kids.size} children")
      if (kids.nonEmpty) {
        val h = histOf(uid)
        kids.foreach { k => histOf(k).foreach { case (l, c) => h.update(l, h.getOrElse(l, 0L) + c) } }
        val nLeaves = h.valuesIterator.sum.toDouble
        val h0 = histOf(kids.head)
        val h1 = if (kids.size > 1) histOf(kids(1)) else mutable.HashMap.empty[String, Long]
        h.keysIterator.foreach { l =>
          val pairs = h0.getOrElse(l, 0L) * h1.getOrElse(l, 0L)
          summand += pairs * h(l) / nLeaves
        }
      } else {
        val lbl = labels.get(uid).orElse(byUid(uid).label)
        lbl.foreach(l => histOf(uid).update(l, 1L))
      }
    }
    val rootHist = histOf(root.get)
    val pStar = rootHist.valuesIterator.map(x => x * (x - 1) / 2.0).sum
    summand / pStar
  }

  /** A4, fixed-point — dendrogram purity as EXACT integer arithmetic:
    * per (internal node v, label l), pairs-with-LCA-v = n_l(c1)·n_l(c2)
    * each contribute `(n_l(v)·1e9) div n(v)` (truncating integer
    * division, the B³ scaled-integer trick), summed exactly. Returns
    * (summand, pStarPairs); purity = summand / (1e9 · pStarPairs) with
    * ONE final double division — order-independent and bit-identical
    * across engines, which is what lets the h6 query carry a DuckDB
    * oracle for the purity metric itself.
    */
  def dendrogramPurityFixedPoint(nodes: Seq[TreeNode]): (Long, Long) = {
    val children = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    var root: Option[String] = None
    nodes.foreach { n =>
      n.parentUid match {
        case Some(p) => children.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += n.uid
        case None    => root = Some(n.uid)
      }
    }
    require(root.isDefined, "dendrogram has no root (parentUid == None) row")
    val byUid = nodes.map(n => n.uid -> n).toMap

    val hist = mutable.HashMap.empty[String, mutable.HashMap[String, Long]]
    def histOf(uid: String): mutable.HashMap[String, Long] =
      hist.getOrElseUpdate(uid, mutable.HashMap.empty)

    val order = mutable.ArrayBuffer.empty[String]
    val stack = mutable.Stack(root.get)
    while (stack.nonEmpty) {
      val uid = stack.pop()
      order += uid
      children.getOrElse(uid, Nil).foreach(stack.push)
    }

    var summand = 0L
    order.reverseIterator.foreach { uid =>
      val kids = children.getOrElse(uid, Nil)
      require(kids.size <= 2,
        s"dendrogramPurityFixedPoint requires a binary tree; node $uid has ${kids.size} children")
      if (kids.nonEmpty) {
        val h = histOf(uid)
        kids.foreach { k => histOf(k).foreach { case (l, c) => h.update(l, h.getOrElse(l, 0L) + c) } }
        val nV = h.valuesIterator.sum
        val h0 = histOf(kids.head)
        val h1 = if (kids.size > 1) histOf(kids(1)) else mutable.HashMap.empty[String, Long]
        h.foreach { case (l, nl) =>
          val pairs = h0.getOrElse(l, 0L) * h1.getOrElse(l, 0L)
          if (pairs > 0) summand += pairs * ((nl * 1000000000L) / nV)
        }
      } else {
        byUid(uid).label.foreach(l => histOf(uid).update(l, 1L))
      }
    }
    val pStar = histOf(root.get).valuesIterator.map(x => x * (x - 1) / 2).sum
    (summand, pStar)
  }

  /** A4, distributed — dendrogram purity over a dendrogram *relation*
    * (uid, parent_uid, label), with no driver-side materialization of
    * the tree: the map-monoid label-histogram roll-up of
    * `meercat/dendrogram_purity.py:64-84` re-expressed as an iterative
    * `groupBy(parent)`.
    *
    * Histograms are relational rows (uid, parent, label, cnt). Each
    * round, parents whose children have ALL produced their histograms
    * merge them (`sum(cnt)` per label — the monoid), contribute
    * Σ_l pairs_l · hist_l / n_v to the purity summand (pairs_l =
    * product of the two children's counts; binary trees only, like the
    * reference), and promote the merged histogram one level up. Rounds
    * = tree height; per-round work is a handful of keyed shuffles over
    * the still-pending frontier, so a balanced billion-leaf forest is
    * ~30 rounds of ordinary aggregations — nothing ever collects.
    * Unlabeled leaves carry a null-label zero row so readiness counting
    * still sees them (they contribute nothing, as in the reference).
    *
    * Only per-round scalar contributions cross to the driver. The
    * per-round double sums make repeated runs agree to float-sum
    * reordering (~1e-12 relative); use [[dendrogramPurity]] for the
    * bit-exact small-tree fold.
    */
  def dendrogramPurityDF(tree: DataFrame): Double = {
    val nodes = tree.select(col("uid").cast("string").as("uid"),
      col("parent_uid").cast("string").as("parent_uid"),
      col("label").cast("string").as("label")).persist()
    val childCounts = nodes.where(col("parent_uid").isNotNull)
      .groupBy(col("parent_uid").as("p")).agg(count(lit(1)).as("n_children")).persist()
    // The pairs term below (min·max over a (parent,label) group of
    // exactly 2 rows) is only the reference's h_left[l]·h_right[l] on a
    // BINARY tree — fail loudly on anything else instead of silently
    // diverging from the driver fold.
    val maxKidsRow = childCounts.agg(max(col("n_children"))).collect()(0)
    val maxKids = if (maxKidsRow.isNullAt(0)) 0L else maxKidsRow.getLong(0)
    require(maxKids <= 2,
      s"dendrogramPurityDF requires a binary tree; found a node with $maxKids children")
    val leaves = nodes.join(childCounts, nodes("uid") === childCounts("p"), "left_anti")

    val pStarRow = leaves.where(col("label").isNotNull)
      .groupBy("label").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - 1) / 2.0).as("p_star")).collect()(0)
    val pStar = if (pStarRow.isNullAt(0)) 0.0 else pStarRow.getDouble(0)

    // localCheckpoint (eager) rather than persist: each round's frontier
    // is built from joins against the previous one, so an un-truncated
    // logical plan grows exponentially with tree height and OOMs the
    // driver around a dozen rounds — checkpointing keeps every round's
    // plan O(1).
    var cur = leaves.where(col("parent_uid").isNotNull).select(
      col("uid"), col("parent_uid").as("parent"), col("label"),
      when(col("label").isNotNull, 1L).otherwise(0L).as("cnt")).localCheckpoint()
    var summand = 0.0
    var remaining = cur.count()
    while (remaining > 0) {
      val ready = cur.groupBy("parent").agg(countDistinct("uid").as("got"))
        .join(childCounts, col("parent") === col("p"))
        .where(col("got") === col("n_children"))
        .select("parent").localCheckpoint()
      // progress = some parent completed (frontier ROW count can stay
      // flat across a round: merged histograms re-key under the
      // grandparent without collapsing any labels)
      require(ready.count() > 0,
        s"dendrogram roll-up stalled at $remaining frontier rows — malformed tree " +
          "(dangling parent_uid or non-tree edges)")
      val readyRows = cur.join(ready, Seq("parent"))
      val waiting = cur.join(ready, Seq("parent"), "left_anti")
      val hist = readyRows.groupBy(col("parent"), col("label"))
        .agg(sum(col("cnt")).as("cnt"),
          when(count(lit(1)) === 2, min(col("cnt")) * max(col("cnt")))
            .otherwise(0L).as("pairs"))
      val nv = hist.groupBy("parent").agg(sum(col("cnt")).as("n_v"))
      val contribRow = hist.join(nv, "parent")
        .where(col("label").isNotNull && col("n_v") > 0)
        .agg(sum(col("pairs").cast("double") * col("cnt") / col("n_v"))).collect()(0)
      if (!contribRow.isNullAt(0)) summand += contribRow.getDouble(0)
      val promoted = hist
        .join(nodes.select(col("uid").as("parent"), col("parent_uid").as("gp")), "parent")
        .where(col("gp").isNotNull)
        .select(col("parent").as("uid"), col("gp").as("parent"), col("label"), col("cnt"))
      val next = waiting.select("uid", "parent", "label", "cnt").union(promoted).localCheckpoint()
      remaining = next.count()
      cur = next
    }
    childCounts.unpersist(); nodes.unpersist()
    if (pStar == 0.0) 0.0 else summand / pStar
  }

  /** A4 front door: driver fold for small trees (bit-exact, one pass),
    * distributed roll-up past `driverFoldMaxNodes` — the cluster-level
    * asymmetry argument in the file Scaladoc only holds per tree, and a
    * single global stream's tree is ∝ input size.
    */
  def purityAuto(tree: DataFrame, driverFoldMaxNodes: Long = 100000L): Double = {
    // ONE job routes AND loads: grab up to cutoff+1 rows — if the tree
    // fits, these are exactly the rows the driver fold needs (no
    // separate count() job); the sentinel extra row routes big trees to
    // the distributed roll-up without collecting them.
    val cutoff = math.min(driverFoldMaxNodes, Int.MaxValue - 1L).toInt
    val head = tree.select(col("uid").cast("string"), col("parent_uid").cast("string"),
      col("label").cast("string")).limit(cutoff + 1).collect()
    if (head.length <= cutoff) {
      val nodes = head
        .map(r => TreeNode(r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSeq
      dendrogramPurity(nodes)
    } else dendrogramPurityDF(tree)
  }

  /** C18 (standalone variant) — flat clustering from a dendrogram
    * relation + leaf embeddings (`/root/reference/meercat/cut_tree.py`):
    * bottom-up embedding-sum propagation (`:83-90`), per-internal-node
    * avg-linkage score = dot of the children's (optionally L2-normalized)
    * mean embeddings (`:65-72`), then a DFS cut — descend while
    * score < threshold, emit surviving subtrees as clusters (`:93-103`).
    * Leaves carry an implicit score of 1.0 (the reference's dataclass
    * default), so a threshold > 1 drops leaves — mirrored.
    *
    * Returns leafUid → cluster index (in the reference's DFS emission
    * order).
    */
  def cutTree(nodes: Seq[TreeNode], embeddings: String => Array[Float],
              threshold: Double, dotProd: Boolean = false): Map[String, Int] = {
    val children = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    var root: Option[String] = None
    nodes.foreach { n =>
      n.parentUid match {
        case Some(p) => children.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += n.uid
        case None    => root = Some(n.uid)
      }
    }
    require(root.isDefined, "dendrogram has no root row")

    // pre-order via LIFO stack (reference traverse), then reversed
    val order = mutable.ArrayBuffer.empty[String]
    val stack = mutable.Stack(root.get)
    while (stack.nonEmpty) {
      val uid = stack.pop()
      order += uid
      children.getOrElse(uid, Nil).foreach(stack.push)
    }

    val sums = mutable.HashMap.empty[String, Array[Double]]
    val nLeaves = mutable.HashMap.empty[String, Double]
    val score = mutable.HashMap.empty[String, Double]
    order.reverseIterator.foreach { uid =>
      val kids = children.getOrElse(uid, Nil)
      if (kids.isEmpty) {
        sums(uid) = embeddings(uid).map(_.toDouble)
        nLeaves(uid) = 1.0
        score(uid) = 1.0
      } else {
        val acc = kids.map(sums).reduce { (a, b) => a.zip(b).map { case (x, y) => x + y } }
        sums(uid) = acc
        nLeaves(uid) = kids.map(nLeaves).sum
        score(uid) = {
          def mean(k: String): Array[Double] = {
            val m = sums(k).map(_ / nLeaves(k))
            if (dotProd) m
            else {
              val nn = math.sqrt(m.map(x => x * x).sum)
              if (nn > 0) m.map(_ / nn) else m
            }
          }
          val l = mean(kids.head); val r = mean(kids(1))
          l.zip(r).map { case (x, y) => x * y }.sum
        }
      }
    }

    val out = mutable.HashMap.empty[String, Int]
    val cut = mutable.Stack(root.get)
    var idx = 0
    while (cut.nonEmpty) {
      val uid = cut.pop()
      if (score(uid) < threshold) children.getOrElse(uid, Nil).foreach(cut.push)
      else {
        // all childless nodes under uid
        val sub = mutable.Stack(uid)
        while (sub.nonEmpty) {
          val x = sub.pop()
          val kids = children.getOrElse(x, Nil)
          if (kids.isEmpty) out(x) = idx else kids.foreach(sub.push)
        }
        idx += 1
      }
    }
    out.toMap
  }
}
