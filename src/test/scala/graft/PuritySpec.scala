package graft

import graft.operators.Trees

/** Golden-equivalence against the REFERENCE dendrogram-purity
  * implementation: expected values computed by running
  * /root/reference/meercat/dendrogram_purity.py on three random binary
  * trees (8 leaves, random 3-way labels) serialized in its own TSV
  * format. Non-trivial values (0.64/0.46/0.63) pin the histogram
  * roll-up and pair-counting semantics exactly.
  */
class PuritySpec extends SparkSpec {

  private val cases: Seq[(String, Map[String, String], Double)] = Seq(
    ("n6\tNone\tNone\nn4\tn6\tNone\nn5\tn6\tNone\nn3\tn4\tNone\nl3\tn4\tNone\nl4\tn5\tNone\nl5\tn5\tNone\nn2\tn3\tNone\nn0\tn3\tNone\nn1\tn2\tNone\nl6\tn2\tNone\nl1\tn0\tNone\nl2\tn0\tNone\nl7\tn1\tNone\nl0\tn1\tNone\n", Map("l0" -> "y", "l1" -> "y", "l2" -> "x", "l3" -> "z", "l4" -> "x", "l5" -> "x", "l6" -> "x", "l7" -> "x"), 0.6378787878787878),
    ("n6\tNone\tNone\nl3\tn6\tNone\nn5\tn6\tNone\nl6\tn5\tNone\nn4\tn5\tNone\nn2\tn4\tNone\nn3\tn4\tNone\nn0\tn2\tNone\nn1\tn2\tNone\nl1\tn3\tNone\nl5\tn3\tNone\nl7\tn0\tNone\nl0\tn0\tNone\nl2\tn1\tNone\nl4\tn1\tNone\n", Map("l0" -> "y", "l1" -> "x", "l2" -> "y", "l3" -> "z", "l4" -> "x", "l5" -> "y", "l6" -> "z", "l7" -> "x"), 0.4642857142857143),
    ("n6\tNone\tNone\nn5\tn6\tNone\nn4\tn6\tNone\nn3\tn5\tNone\nl4\tn5\tNone\nl0\tn4\tNone\nl2\tn4\tNone\nl3\tn3\tNone\nn2\tn3\tNone\nl5\tn2\tNone\nn1\tn2\tNone\nl1\tn1\tNone\nn0\tn1\tNone\nl6\tn0\tNone\nl7\tn0\tNone\n", Map("l0" -> "z", "l1" -> "y", "l2" -> "x", "l3" -> "x", "l4" -> "z", "l5" -> "x", "l6" -> "y", "l7" -> "y"), 0.6285714285714287))

  private def parse(tsv: String): Seq[Trees.TreeNode] =
    tsv.split("\n").filter(_.nonEmpty).toSeq.map { line =>
      val Array(uid, parent, label) = line.split("\t")
      Trees.TreeNode(uid,
        if (parent == "None") None else Some(parent),
        if (label == "None") None else Some(label))
    }

  cases.zipWithIndex.foreach { case ((tsv, labels, expected), i) =>
    test(s"reference-equivalent dendrogram purity on random tree $i") {
      Trees.dendrogramPurity(parse(tsv), labels) shouldBe expected +- 1e-6
    }
  }

  Seq(7L, 99L).foreach { seedVal =>
    test(s"distributed roll-up matches the driver fold on a random binary tree (seed $seedVal)") {
      // seeded random topology: grow by replacing a random leaf slot
      // with an internal node holding two fresh leaves
      val rnd = new scala.util.Random(seedVal)
      val nodes = scala.collection.mutable.ArrayBuffer(
        Trees.TreeNode("n0", None, None))
      val open = scala.collection.mutable.ArrayBuffer("n0")
      var next = 1
      while (nodes.length < 120) {
        val parent = open.remove(rnd.nextInt(open.length))
        val kids = Seq(s"n$next", s"n${next + 1}")
        next += 2
        kids.foreach { k =>
          if (rnd.nextBoolean() && nodes.length > 20) {
            nodes += Trees.TreeNode(k, Some(parent), Some("L" + rnd.nextInt(5)))
          } else {
            nodes += Trees.TreeNode(k, Some(parent), None)
            open += k
          }
        }
      }
      // close remaining open slots as labeled leaves
      val closed = nodes.map { n =>
        if (open.contains(n.uid)) n.copy(label = Some("L" + rnd.nextInt(5))) else n
      }.toSeq
      import spark.implicits._
      val df = closed.map(n => (n.uid, n.parentUid.orNull, n.label.orNull))
        .toDF("uid", "parent_uid", "label")
      Trees.dendrogramPurityDF(df) shouldBe Trees.dendrogramPurity(closed) +- 1e-9
    }
  }

  test("distributed roll-up handles a degenerate chain (height = rounds worst case)") {
    // caterpillar: internal node k has leaf l_k and internal k+1 as
    // children — every round completes exactly one node while the rest
    // of the frontier waits, the roll-up's worst case.
    val depth = 12
    val nodes = (0 until depth).flatMap { k =>
      val internal = Trees.TreeNode(s"n$k", if (k == 0) None else Some(s"n${k - 1}"), None)
      val leaf = Trees.TreeNode(s"l$k", Some(s"n$k"), Some(if (k % 3 == 0) "a" else "b"))
      Seq(internal, leaf)
    } :+ Trees.TreeNode("lend", Some(s"n${depth - 1}"), Some("a"))
    import spark.implicits._
    val df = nodes.map(n => (n.uid, n.parentUid.orNull, n.label.orNull))
      .toDF("uid", "parent_uid", "label")
    Trees.dendrogramPurityDF(df) shouldBe Trees.dendrogramPurity(nodes) +- 1e-9
  }

  cases.zipWithIndex.foreach { case ((tsv, labels, expected), i) =>
    test(s"distributed histogram roll-up matches the reference on random tree $i") {
      import spark.implicits._
      val df = parse(tsv)
        .map(n => (n.uid, n.parentUid.orNull, labels.get(n.uid).orElse(n.label).orNull))
        .toDF("uid", "parent_uid", "label")
      Trees.dendrogramPurityDF(df) shouldBe expected +- 1e-6
    }
  }
}
