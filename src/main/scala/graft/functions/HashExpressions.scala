package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the mod-p text-hash kernels.
  *
  * These are the hot inner loops of the dedup pack (SURVEY §2.3's
  * vectorized-kernel tactic, re-done the Spark way): the higher-order-
  * function formulation (aggregate over sequence + substring per char)
  * is interpreted per element and costs ~100× a compiled loop at sf0.1.
  * Semantics are identical to the HOF versions — and to the DuckDB
  * oracle SQL — char-by-char polynomial fold mod 1e9+7, BMP/ASCII
  * codepoints (chars, like ascii(substring(s,i,1))).
  */
object HashExpressions {
  val P: Long = 1000000007L

  /** Opt-in sortedness guard for [[SortedIntersectCount]] (ADVICE r20):
    * the kernel silently UNDERCOUNTS on unsorted input, and the
    * invariant (array_sort at the set materializations) lives far from
    * the consumers. With `-Dgraft.strictSortedKernels=true` (read once
    * at class init; local-mode = one JVM) both the interpreted eval and
    * the generated code detect an out-of-order step on the consumed
    * prefix and throw instead. Default OFF: the merge is the d-family's
    * hottest per-pair loop and the extra compares are measurable there;
    * the specs pin the guard, production pins the invariant at the
    * array_sort site.
    */
  private[graft] val strictSorted: Boolean =
    java.lang.Boolean.getBoolean("graft.strictSortedKernels")

  def polyHashChars(s: String, from: Int, until: Int, init: Long): Long = {
    var h = init
    var i = from
    while (i < until) { h = (h * 31 + s.charAt(i)) % P; i += 1 }
    h
  }
}

/** Whole-string polynomial hash: long, 0 for the empty string.
  * Whole-stage-codegen'd — stays inside the generated loop.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  import HashExpressions._

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    polyHashChars(s, 0, s.length, 0L)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31 + $s.charAt($i)) % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Distinct hashed n-token shingles of a token array, in first-occurrence
  * order (= array_distinct over transform): each shingle hash covers the
  * tokens joined by a single space, exactly like
  * poly_hash(concat_ws(' ', slice(toks, i, n))). One compiled pass.
  */
case class ShingleHashSet(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {
  import HashExpressions._

  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val toks = new Array[String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    val seen = mutable.LinkedHashSet.empty[Long]
    var start = 0
    while (start <= len - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        if (j > 0) h = (h * 31 + ' ') % P
        h = polyHashChars(toks(start + j), 0, toks(start + j).length, h)
        j += 1
      }
      seen += h
      start += 1
    }
    new GenericArrayData(seen.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** Per-document shingle-hash COUNTS — array<struct<h, c>> of each
  * distinct n-token shingle hash (same space-joined mod-p hash as
  * [[ShingleHashSet]], first-occurrence order) with its within-document
  * multiplicity, one compiled pass. The occurrence-weighted dedup/LM
  * ops (t11) explode this instead of one row per shingle OCCURRENCE:
  * the shuffled relation shrinks to distinct-shingles-per-doc rows of
  * (long, long) — no string allocation, no per-string hash expression,
  * no duplicate-occurrence rows through the exchange.
  */
case class ShingleHashCounts(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {
  import HashExpressions._

  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "shingle_hash_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val toks = new Array[String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    val counts = mutable.LinkedHashMap.empty[Long, Long]
    var start = 0
    while (start <= len - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        if (j > 0) h = (h * 31 + ' ') % P
        h = polyHashChars(toks(start + j), 0, toks(start + j).length, h)
        j += 1
      }
      counts.update(h, counts.getOrElse(h, 0L) + 1L)
      start += 1
    }
    new GenericArrayData(counts.iterator.map { case (h, c) => InternalRow(h, c) }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashCounts =
    copy(child = newChild)
}

/** Per-row n-token shingle STRING counts: each distinct space-joined
  * n-gram of the token array with its occurrence count, first-seen
  * order — the string sibling of [[ShingleHashCounts]] for queries
  * whose OUTPUT is the n-gram text (t8 top-ngrams, t12 BPE pair
  * counts; the hash form can't serve them — a collision would merge
  * two different output strings). One pass, direct UTF8String concat:
  * the HOF formulation (`transform(sequence, slice + concat_ws)`)
  * spends ~15 of t8's 16 s at sf1 building 2.7 M intermediate arrays;
  * this kernel also shrinks the explode to one row per DISTINCT n-gram
  * per doc, so downstream aggregation sums `c` instead of counting
  * occurrence rows.
  */
case class ShingleStringCounts(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ngram", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "shingle_string_counts"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val counts = mutable.LinkedHashMap.empty[UTF8String, Long]
    val window = new Array[UTF8String](n)
    var start = 0
    while (start <= len - n) {
      var j = 0
      while (j < n) { window(j) = toks(start + j); j += 1 }
      // concatWs allocates a fresh UTF8String — safe to key/emit without copy
      val sh = UTF8String.concatWs(space, window: _*)
      counts.update(sh, counts.getOrElse(sh, 0L) + 1L)
      start += 1
    }
    new GenericArrayData(counts.iterator.map { case (s, c) => InternalRow(s, c) }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStringCounts =
    copy(child = newChild)
}

/** Per-row CHAR-BIGRAM term-frequency relation straight from the
  * string: one pass over the code points, counting each distinct
  * two-character bigram (first-occurrence order) with the L2 weight
  * tf/√(Σtf²) — the fused form of `transform(sequence(...),
  * substring(text, i, 2))` + [[TermCounts]]. The fusion matters:
  * UTF8String.substringSQL re-scans from the string start on every
  * call (code-point indexing), so the expression-built bigram array is
  * O(len²) per document — 17.6 s of x1's sf1 wall before this kernel.
  * Code-point stepping (never UTF-16 units) keeps the bigram
  * boundaries identical to Spark's and DuckDB's substring semantics
  * for supplementary characters. Strings shorter than 2 code points
  * yield an empty array, matching charBigramSql's CASE.
  */
case class CharBigramCounts(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "char_bigram_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val counts = mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i + 1 < cps.length) {
      val bg = new String(cps, i, 2)
      counts.update(bg, counts.getOrElse(bg, 0L) + 1L)
      i += 1
    }
    var sq = 0L
    counts.valuesIterator.foreach(c => sq += c * c)
    val nrm = math.sqrt(sq.toDouble)
    new GenericArrayData(counts.iterator.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c, c.toDouble / nrm)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CharBigramCounts =
    copy(child = newChild)
}

/** Per-row term-frequency relation: counts each distinct string of the
  * input array (first-occurrence order) and attaches the L2-normalized
  * weight tf/√(Σtf²) — one local pass, no shuffle. The per-document
  * half of a TF vectorizer as a scalar expression: downstream code just
  * explodes the result (term: string, tf: long, weight: double).
  */
case class TermCounts(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "term_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = mutable.LinkedHashMap.empty[UTF8String, Long]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        counts.update(t, counts.getOrElse(t, 0L) + 1)
      }
      i += 1
    }
    // exact integer Σtf² then one cast, matching sqrt(cast(sum(tf*tf)
    // as double)) on the oracle side bit-for-bit
    var sq = 0L
    counts.valuesIterator.foreach(c => sq += c * c)
    val nrm = math.sqrt(sq.toDouble)
    new GenericArrayData(counts.iterator.map { case (t, c) =>
      InternalRow(t.copy(), c, c.toDouble / nrm)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

/** Deterministic hashing-projection embedding of a token array (the
  * F4-boundary toy encoder): component k = Σ_tokens(((th + k + seed) ·
  * 2654435761) mod P − P/2) / n / (P/2), exact long sums, one final
  * division chain — identical to the HOF formulation and the f4 oracle.
  */
case class HashEmbedExpr(child: Expression, dim: Int, seed: Long)
  extends UnaryExpression with CodegenFallback {
  import HashExpressions._

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hash_embed"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      th(i) = polyHashChars(s, 0, s.length, 0L)
      i += 1
    }
    val out = new Array[Float](dim)
    var k = 0
    while (k < dim) {
      var sum = 0L
      i = 0
      while (i < n) { sum += ((th(i) + k + seed) * 2654435761L) % P - P / 2; i += 1 }
      out(k) = (sum.toDouble / n / (P / 2).toDouble).toFloat
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbedExpr =
    copy(child = newChild)
}

/** Repetition statistics of a token array: (max multiplicity of any
  * n-token shingle, total shingle count) in one compiled pass — the
  * per-document kernel of the degenerate-text detector. Counts by the
  * actual token n-tuple (UTF8String equality, no hashing-with-collisions),
  * so the result is exactly max-group-count == max-run-of-sorted used by
  * the oracle's unnest+GROUP BY. Replaces a sort_array + interpreted
  * Catalyst `aggregate` HOF fold that cost ~3 ms/doc of pure interpreter
  * overhead (round-4 "What's wrong" #1).
  */
case class RepetitionStats(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = StructType(Seq(
    StructField("max_rep", LongType, nullable = false),
    StructField("n_tris", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val total = len - n + 1
    if (total <= 0) return InternalRow(0L, 0L)
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    // Key by the token n-tuple: tokens come from split(text, ' ') so they
    // contain no spaces, making tuple equality identical to equality of
    // the space-joined shingle string the oracle groups by.
    val counts = new java.util.HashMap[java.util.List[UTF8String], Long](total * 2)
    var best = 0L
    var start = 0
    while (start < total) {
      val key = java.util.Arrays.asList(java.util.Arrays.copyOfRange(toks, start, start + n): _*)
      val c = counts.merge(key, 1L, (a, b) => a + b)
      if (c > best) best = c
      start += 1
    }
    InternalRow(best, total.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** Within-document duplicated n-gram statistics — the Gopher-class
  * repetition signal next to [[RepetitionStats]]' most-common-n-gram
  * share: `struct(dup_occ, n_ngrams)` where `dup_occ` counts ALL
  * occurrences of token n-grams appearing ≥ 2 times in the document
  * (so `dup_occ / n_ngrams` is the "fraction of n-grams in duplicated
  * n-grams" quality rule). One compiled pass with a per-document
  * hashmap — the whole operator stays map-side, no shuffle: at 100 TB
  * this is a scan, not an aggregation.
  *
  * Same n-tuple keying as RepetitionStats: tokens come from
  * split(text, ' ') and contain no spaces, so tuple equality matches
  * equality of the space-joined shingle string the oracle groups by.
  */
case class DupNgramStats(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = StructType(Seq(
    StructField("dup_occ", LongType, nullable = false),
    StructField("n_ngrams", LongType, nullable = false)))
  override def prettyName: String = "dup_ngram_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val total = len - n + 1
    if (total <= 0) return InternalRow(0L, 0L)
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val counts = new java.util.HashMap[java.util.List[UTF8String], Long](total * 2)
    // dup_occ in the same pass: an n-gram's 2nd occurrence adds 2 (itself
    // + the retroactively-duplicated 1st), each later occurrence adds 1
    var dup = 0L
    var start = 0
    while (start < total) {
      val key = java.util.Arrays.asList(java.util.Arrays.copyOfRange(toks, start, start + n): _*)
      val c = counts.merge(key, 1L, (a, b) => a + b)
      if (c == 2L) dup += 2L else if (c > 2L) dup += 1L
      start += 1
    }
    InternalRow(dup, total.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): DupNgramStats =
    copy(child = newChild)
}

/** SimHash of a token array — one compiled pass replacing the
  * bits×tokens interpreted HOF fold (the toRdd bench exposed the HOF
  * form at ~9× this cost): per token one mod-p polynomial hash, per
  * bit a +1/-1 vote on that hash's bit, result bit k set iff the vote
  * sum is positive. Semantics identical to the HOF/oracle formulation
  * (shiftright(h, k) & 1 votes, strict > 0 threshold).
  */
case class SimHashExpr(child: Expression, bits: Int)
  extends UnaryExpression with CodegenFallback {
  import HashExpressions._

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63]: $bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "sim_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      val h = polyHashChars(s, 0, s.length, 0L)
      var k = 0
      while (k < bits) {
        votes(k) += (if (((h >> k) & 1L) == 1L) 1L else -1L)
        k += 1
      }
      i += 1
    }
    var res = 0L
    var k = 0
    while (k < bits) {
      if (votes(k) > 0) res |= (1L << k)
      k += 1
    }
    res
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Marker-vote language ID — one compiled pass replacing the
  * 5-language × 5-marker interpreted filter HOFs: each token is looked
  * up in a precompiled marker→languages map (a marker can vote for
  * several languages, e.g. 'la' ∈ es AND fr), then the winner is the
  * FIRST language in sorted order with the strictly highest hit count
  * ('und' on zero hits) — the exact fold [[graft.functions
  * .TextFunctions.langId]]'s HOF form and the t2 oracle encode.
  */
case class LangIdVote(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id_vote"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](LangIdVote.langs.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val ls = LangIdVote.markerIdx.getOrElse(arr.getUTF8String(i).toString, null)
        if (ls != null) {
          var j = 0
          while (j < ls.length) { counts(ls(j)) += 1L; j += 1 }
        }
      }
      i += 1
    }
    var bi = 0
    var bh = counts(0)
    var k = 1
    while (k < counts.length) {
      if (counts(k) > bh) { bi = k; bh = counts(k) }
      k += 1
    }
    if (bh > 0L) UTF8String.fromString(LangIdVote.langs(bi))
    else UTF8String.fromString("und")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdVote =
    copy(child = newChild)
}

object LangIdVote {
  /** Sorted language codes — the fold's tie-break order. */
  val langs: IndexedSeq[String] = TextFunctions.langMarkers.keys.toVector.sorted
  /** marker token → indices of the languages it votes for. */
  val markerIdx: Map[String, Array[Int]] =
    langs.zipWithIndex
      .flatMap { case (l, i) => TextFunctions.langMarkers(l).map(_ -> i) }
      .groupBy(_._1)
      .map { case (m, ps) => m -> ps.map(_._2).sorted.toArray }
}

/** Distinct hashed character n-grams of a string, first-occurrence
  * order — poly_hash over each length-n char window, one compiled pass.
  */
case class CharNgramHashSet(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {
  import HashExpressions._

  require(n >= 1, "ngram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hash_set"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val seen = mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i <= s.length - n) {
      seen += polyHashChars(s, i, i + n, 0L)
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashSet =
    copy(child = newChild)
}

/** Intersection COUNT of two ASCENDING-SORTED long arrays — one
  * compiled merge scan, zero allocation. The near-dup verify is the
  * measured wall of the whole d family at scale (ProfileD7, SCALE.md
  * round 15: the edge build is ~95% of d7's sf10 cost), and its hot
  * loop was `size(array_intersect(a, b))`: Spark's generic
  * array_intersect builds a hash set AND an output array PER PAIR just
  * to take its length. Sorting each doc's set ONCE at materialization
  * (array_sort in [[graft.operators.Dedup.shingleSets]] / the d5 tri
  * build — every consumer is order-independent: minhash folds,
  * explodes, intersection counts) converts the per-pair cost to an
  * O(|a|+|b|) branch-predictable merge with no allocation at all.
  *
  * CONTRACT: both inputs sorted ascending (duplicates allowed — equal
  * runs advance both sides one step at a time, which matches set
  * semantics on the distinct-by-construction shingle/ngram sets).
  * Unsorted input returns an UNDERCOUNT, not an error, by default —
  * this kernel is private plumbing for the set relations above, not a
  * public API; `-Dgraft.strictSortedKernels=true` compiles in an
  * out-of-order detector that throws instead (ADVICE r20; the specs
  * run the guard, production keeps the zero-overhead loop).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  // Element width is decided at PLAN time from each child's array
  // element type (round 22, §2.3 narrower types: the d-family set
  // relations store their mod-p hashes as array<int> — every value is
  // < 2³¹ — halving the verify-join shuffle bytes; this kernel reads
  // either width, per side, and keeps comparing in long).
  private def isIntSide(e: Expression): Boolean = e.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  private lazy val leftInt = isIntSide(left)
  private lazy val rightInt = isIntSide(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    val strict = HashExpressions.strictSorted
    var px = Long.MinValue
    var py = Long.MinValue
    while (i < na && j < nb) {
      val x = if (leftInt) a.getInt(i).toLong else a.getLong(i)
      val y = if (rightInt) b.getInt(j).toLong else b.getLong(j)
      if (strict) {
        if (x < px || y < py)
          throw new IllegalArgumentException(
            "sorted_intersect_count: input array not sorted ascending")
        px = x; py = y
      }
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // own generated method, not inline — same JIT-size rationale as
      // the vector fold kernels. The strict-sorted guard is decided at
      // CODEGEN time (plan construction), so the default production
      // loop carries zero extra work.
      val guard =
        if (!HashExpressions.strictSorted) ""
        else
          s"""
             |    if (x < px || y < py) throw new IllegalArgumentException(
             |      "sorted_intersect_count: input array not sorted ascending");
             |    px = x; py = y;
           """.stripMargin
      // per-side accessor, baked at codegen time from the child types
      val getA = if (leftInt) "getInt" else "getLong"
      val getB = if (rightInt) "getInt" else "getLong"
      val fn = ctx.freshName("sortedIntersectCount")
      val fun = ctx.addNewFunction(fn,
        s"""
           |private long $fn(org.apache.spark.sql.catalyst.util.ArrayData a,
           |    org.apache.spark.sql.catalyst.util.ArrayData b) {
           |  int na = a.numElements(); int nb = b.numElements();
           |  int i = 0; int j = 0; long c = 0L;
           |  long px = Long.MIN_VALUE; long py = Long.MIN_VALUE;
           |  while (i < na && j < nb) {
           |    long x = (long) a.$getA(i); long y = (long) b.$getB(j);$guard
           |    if (x == y) { c++; i++; j++; }
           |    else if (x < y) { i++; } else { j++; }
           |  }
           |  return c;
           |}
         """.stripMargin)
      s"${ev.value} = $fun($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** All k MinHash values of a shingle-hash set in ONE compiled pass —
  * h_j(x) = ((2j+1)·x + 7919·j + 1) mod P minimized over the set, the
  * exact fold [[graft.functions.TextFunctions.minHashSignature]]'s HOF
  * formulation computes (and the DuckDB oracle replays). The HOF form
  * (transform over k × aggregate over the set) is interpreted per
  * element: k=16 signatures over a ~200-shingle doc cost ~3200 lambda
  * invocations PER DOCUMENT — a per-doc cost that dominates the d
  * family's band build at scale. Here: one loop over the set, k
  * running minima in a local array, k·|hs| fused multiply-mod steps.
  */
case class MinHashSig(child: Expression, k: Int)
  extends UnaryExpression {
  import HashExpressions._

  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // accept array<int> as well as array<long> (round 22, §2.3 narrower
  // types — the set relations store mod-p hashes < 2³¹ as ints); the
  // fold itself stays in long, so the signature is bit-identical
  private lazy val elemInt = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(P)
    var i = 0
    while (i < n) {
      val x = if (elemInt) arr.getInt(i).toLong else arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = ((2L * j + 1L) * x + 7919L * j + 1L) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (elemInt) "getInt" else "getLong"
      val fn = ctx.freshName("minHashSig")
      val fun = ctx.addNewFunction(fn,
        s"""
           |private org.apache.spark.sql.catalyst.util.GenericArrayData $fn(
           |    org.apache.spark.sql.catalyst.util.ArrayData arr) {
           |  int n = arr.numElements();
           |  long[] mins = new long[$k];
           |  java.util.Arrays.fill(mins, ${P}L);
           |  for (int i = 0; i < n; i++) {
           |    long x = (long) arr.$get(i);
           |    for (int j = 0; j < $k; j++) {
           |      long h = ((2L * j + 1L) * x + 7919L * j + 1L) % ${P}L;
           |      if (h < mins[j]) mins[j] = h;
           |    }
           |  }
           |  return new org.apache.spark.sql.catalyst.util.GenericArrayData(mins);
           |}
         """.stripMargin)
      s"${ev.value} = $fun($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
