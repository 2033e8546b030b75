package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
