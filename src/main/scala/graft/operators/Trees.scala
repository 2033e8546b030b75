package graft.operators

import scala.collection.mutable

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
