package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native expressions for the dense-vector kernels (same rationale as
  * HashExpressions: the zip_with/aggregate HOF formulation is
  * interpreted per element). Semantics preserved exactly: strict
  * left fold in element order, each element cast to double before the
  * arithmetic — bit-identical to the HOF versions and the DuckDB
  * oracle folds. Element types float or double.
  *
  * Round 19 (VERDICT r18 #6): the four fold kernels implement REAL
  * `doGenCode` instead of CodegenFallback. The fallback put an
  * interpreted, boxing call in the middle of the quantized-ANN hot
  * loops — the PQ assignment alone evaluates n×M×k* distances (4M at
  * sf0.1, measured ~30 executor-CPU-seconds on 2000 vectors) — and,
  * worse, broke the enclosing operator out of whole-stage codegen.
  * The generated loop reads ArrayData elements directly (element type
  * specialized at codegen time) and keeps the join/aggregate stages
  * inside one codegen span. Interpreted eval retained for
  * non-codegen paths; both produce the identical fold.
  */
private object VecEval {
  def read(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** Java source reading element `i` of `arr` as double — the codegen
    * twin of [[read]], specialized at compile time.
    */
  def readJava(arr: String, et: DataType, i: String): String = et match {
    case FloatType => s"(double)$arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case LongType => s"(double)$arr.getLong($i)"
    case IntegerType => s"(double)$arr.getInt($i)"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }
}

/** Σ aᵢ·bᵢ as double, left fold. */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += VecEval.read(a, ta, i) * VecEval.read(b, tb, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // the loop lives in its OWN generated method (addNewFunction),
      // not inline: inlined into a whole-stage-codegen processNext it
      // pushed the mega-method past the JIT's huge-method bytecode
      // limit, de-optimizing the entire stage (measured 2.5× on the
      // RHP family) — a small named method stays JIT-compiled
      val fn = ctx.freshName("vecDot")
      val fun = ctx.addNewFunction(fn,
        s"""
           |private double $fn(org.apache.spark.sql.catalyst.util.ArrayData a,
           |    org.apache.spark.sql.catalyst.util.ArrayData b) {
           |  int n = java.lang.Math.min(a.numElements(), b.numElements());
           |  double s = 0.0;
           |  for (int i = 0; i < n; i++) {
           |    s += ${VecEval.readJava("a", elemType(left), "i")} *
           |      ${VecEval.readJava("b", elemType(right), "i")};
           |  }
           |  return s;
           |}
         """.stripMargin)
      s"${ev.value} = $fun($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ² as double, left fold. */
case class SqNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sq_norm"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val t = elemType
    var s = 0.0
    var i = 0
    while (i < a.numElements()) { val x = VecEval.read(a, t, i); s += x * x; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // own generated method, not inline — see DotProductExpr
      val fn = ctx.freshName("vecSqNorm")
      val fun = ctx.addNewFunction(fn,
        s"""
           |private double $fn(org.apache.spark.sql.catalyst.util.ArrayData a) {
           |  double s = 0.0;
           |  for (int i = 0; i < a.numElements(); i++) {
           |    double x = ${VecEval.readJava("a", elemType, "i")};
           |    s += x * x;
           |  }
           |  return s;
           |}
         """.stripMargin)
      s"${ev.value} = $fun($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): SqNormExpr =
    copy(child = newChild)
}

private object IntVecEval {
  def read(a: ArrayData, et: DataType, i: Int): Long = et match {
    case LongType => a.getLong(i)
    case IntegerType => a.getInt(i).toLong
    case other => throw new IllegalArgumentException(s"unsupported integer element type $other")
  }

  /** Java source reading element `i` of `arr` as long — the codegen
    * twin of [[read]].
    */
  def readJava(arr: String, et: DataType, i: String): String = et match {
    case LongType => s"$arr.getLong($i)"
    case IntegerType => s"(long)$arr.getInt($i)"
    case other => throw new IllegalArgumentException(s"unsupported integer element type $other")
  }
}

/** Σ (aᵢ−bᵢ)² as LONG — the exact integer kernel of the quantized ANN
  * builds (intIvfTopK / pqTopK Lloyd assignment). Integer arithmetic is
  * order-independent, so this is trivially oracle-exact; the native
  * loop replaces a per-element interpreted zip_with/aggregate HOF.
  */
case class IntSqDistExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ivec_sq_dist"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = IntVecEval.read(a, ta, i) - IntVecEval.read(b, tb, i)
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // own generated method, not inline — see DotProductExpr
      val fn = ctx.freshName("ivecSqDist")
      val fun = ctx.addNewFunction(fn,
        s"""
           |private long $fn(org.apache.spark.sql.catalyst.util.ArrayData a,
           |    org.apache.spark.sql.catalyst.util.ArrayData b) {
           |  int n = java.lang.Math.min(a.numElements(), b.numElements());
           |  long s = 0L;
           |  for (int i = 0; i < n; i++) {
           |    long d = ${IntVecEval.readJava("a", elemType(left), "i")} -
           |      ${IntVecEval.readJava("b", elemType(right), "i")};
           |    s += d * d;
           |  }
           |  return s;
           |}
         """.stripMargin)
      s"${ev.value} = $fun($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntSqDistExpr =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ as LONG — integer-dot ranking kernel of the quantized ANN. */
case class IntDotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ivec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += IntVecEval.read(a, ta, i) * IntVecEval.read(b, tb, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // own generated method, not inline — see DotProductExpr
      val fn = ctx.freshName("ivecDot")
      val fun = ctx.addNewFunction(fn,
        s"""
           |private long $fn(org.apache.spark.sql.catalyst.util.ArrayData a,
           |    org.apache.spark.sql.catalyst.util.ArrayData b) {
           |  int n = java.lang.Math.min(a.numElements(), b.numElements());
           |  long s = 0L;
           |  for (int i = 0; i < n; i++) {
           |    s += ${IntVecEval.readJava("a", elemType(left), "i")} *
           |      ${IntVecEval.readJava("b", elemType(right), "i")};
           |  }
           |  return s;
           |}
         """.stripMargin)
      s"${ev.value} = $fun($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Sign-bit binary code of a float vector, packed as TWO 32-bit
  * halves in BIGINTs — the 1-bit quantization tier (64 dims → 8
  * packed bytes, 32× smaller than float32): bit i of half h is
  * `v[i] > 0`. Two halves, not one 64-bit fold: the oracle replays
  * the fold in DuckDB, where `acc*2` on a set bit 63 would raise on
  * BIGINT overflow (Spark would wrap silently) — 32-bit halves keep
  * both engines exact. Exactly 64 dims required: the SQL oracle
  * hardcodes the 1..32 / 33..64 halves, and a shorter vector would
  * pack into different bit positions than the SQL's NULL→0 fold —
  * requiring 64 makes the parity hold by construction. Hamming
  * distance downstream is bit_count(hi⊕hi') + bit_count(lo⊕lo').
  */
case class SignCode(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))
  override def prettyName: String = "sign_code"

  private lazy val et: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(n == 64, s"sign_code packs exactly 64 dims (SQL-oracle bit layout), got $n")
    val half = 32
    var hi = 0L
    var i = 0
    while (i < half) {
      hi = hi * 2 + (if (!arr.isNullAt(i) && VecEval.read(arr, et, i) > 0) 1L else 0L)
      i += 1
    }
    var lo = 0L
    while (i < n) {
      lo = lo * 2 + (if (!arr.isNullAt(i) && VecEval.read(arr, et, i) > 0) 1L else 0L)
      i += 1
    }
    InternalRow(hi, lo)
  }

  override protected def withNewChildInternal(newChild: Expression): SignCode =
    copy(child = newChild)
}

case class SqDistExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sq_dist"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = VecEval.read(a, ta, i) - VecEval.read(b, tb, i); s += d * d; i += 1 }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}
