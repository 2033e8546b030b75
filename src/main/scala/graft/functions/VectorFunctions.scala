package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Column-level dense-vector math over `ArrayType(FloatType)` embeddings.
  *
  * Mirrors the reference's NumPy kernels (dot / L2-norm / cosine / blend:
  * `/root/reference/meercat/nn_thresh.py:112-115,172-173`,
  * `/root/reference/meercat/baseline.py:34-40`) as Catalyst higher-order
  * functions — codegen'd, no UDFs, so similarity joins stay inside
  * whole-stage codegen.
  *
  * All folds are strict left-to-right over the array after a cast to
  * double, which makes results bit-reproducible across engines that fold
  * the same way (the DuckDB oracle SQL is written to match).
  */
object VectorFunctions {

  /** Σ a_i·b_i as double; left fold in element order. Native expression
    * — the zip_with/aggregate HOF form is interpreted per element.
    */
  def dotProduct(a: Column, b: Column): Column =
    Shim.column(DotProductExpr(Shim.expression(a), Shim.expression(b)))

  /** Σ a_i² as double. */
  def sqNorm(a: Column): Column =
    Shim.column(SqNormExpr(Shim.expression(a)))

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(sqNorm(a))

  /** cos(a,b) = a·b / (‖a‖‖b‖) */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Sign-bit binary code — struct(hi, lo) of two 32-bit halves, one
    * compiled pass ([[SignCode]]); the 1-bit quantization tier.
    */
  def signCode(a: Column): Column =
    Shim.column(SignCode(Shim.expression(a)))

  /** a / ‖a‖₂ (float-typed result), cf. nn_thresh.py:172-173.
    *
    * The norm is hoisted: computed once into a 1-element struct wrapper
    * and referenced inside the per-element lambda, so normalization is
    * O(d) per row, not O(d²) (recomputing ‖a‖ per element would be ~590k
    * multiplies for a 768-dim embedding).
    */
  def l2Normalize(a: Column): Column =
    aggregate(
      array(a),                            // single-element fold = a "let" binding
      struct(l2Norm(a).as("n")),           // zero: the hoisted norm
      (acc, v) => acc,                     // no-op fold keeps the norm as-is
      acc => transform(a, x => (x.cast("double") / acc.getField("n")).cast("float")))

  /** w·simA + (1−w)·simB — the reference's score blend
    * (baseline.py:40 with weights 0.8/0.2, combo.py:39 with α).
    */
  def blend(simA: Column, simB: Column, w: Double): Column =
    lit(w) * simA + lit(1.0 - w) * simB

  /** Squared Euclidean distance (native expression). */
  def sqDist(a: Column, b: Column): Column =
    Shim.column(SqDistExpr(Shim.expression(a), Shim.expression(b)))

  /** Exact integer squared distance over code vectors (native). */
  def intSqDist(a: Column, b: Column): Column =
    Shim.column(IntSqDistExpr(Shim.expression(a), Shim.expression(b)))

  /** Exact integer dot product over code vectors (native). */
  def intDot(a: Column, b: Column): Column =
    Shim.column(IntDotExpr(Shim.expression(a), Shim.expression(b)))

  /** Packed PQ encode — one int64 code word per vector, argmin per
    * subspace with smallest-code tie-break ([[PqEncodePacked]]).
    */
  def pqEncodePacked(v: Column, cb: IndexedSeq[Long], valid: IndexedSeq[Boolean],
                     perm: IndexedSeq[Int],
                     m: Int, subDim: Int, kCodes: Int): Column =
    Shim.column(PqEncodePacked(Shim.expression(v), cb, valid, perm, m, subDim, kCodes))

  /** ADC reconstruction dot: query array × packed code word against the
    * fitted codebook ([[AdcScorePacked]]).
    */
  def adcScorePacked(q: Column, codes: Column, cb: IndexedSeq[Long],
                     perm: IndexedSeq[Int], m: Int, subDim: Int,
                     kCodes: Int): Column =
    Shim.column(AdcScorePacked(Shim.expression(q), Shim.expression(codes),
      cb, perm, m, subDim, kCodes))

  /** Symmetric PQ distance over two packed code words via the
    * precomputed code-pair table ([[PqSymDistPacked]]).
    */
  def pqSymDistPacked(a: Column, b: Column, dtab: IndexedSeq[Long],
                      m: Int, kCodes: Int): Column =
    Shim.column(PqSymDistPacked(Shim.expression(a), Shim.expression(b),
      dtab, m, kCodes))

  /** Per-row int8 quantization scale: max(|v|)/127 (1.0 for the zero
    * vector). At 100 TB the embedding table IS the storage bill —
    * symmetric scalar quantization cuts it 4× while dot products stay
    * computable as (int dot) · scaleA · scaleB. Max-selection is exact
    * (no float accumulation), so the scale is engine-portable.
    */
  def quantizeScale(vec: Column): Column = {
    val maxAbs = aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))
    when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
  }

  /** Quantize to int8 codes with a precomputed [[quantizeScale]]:
    * q_i = round(v_i / scale) ∈ [−127, 127]. Spark's HALF_UP and
    * DuckDB's round both round halves away from zero — oracle-exact.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") / scale).cast("int"))

  /** Dequantize int8 codes back to float: q_i · scale. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale).cast("float"))

  /** Deterministic pseudo-random hyperplane component: integer-exact
    * (Knuth multiplicative hash mod p, shifted to be sign-balanced), so
    * any engine reproduces the same plane bit-for-bit — unlike
    * transcendental-function generation, whose last-ulp platform
    * differences can flip a projection's sign.
    */
  def rhpWeight(seed: Long, k: Int, dim: Int, i: Int): Long = {
    val p = 1000000007L
    ((seed + k.toLong * dim + i) * 2654435761L) % p - p / 2
  }

  /** Random-hyperplane LSH bucket id: sign-bit signature of the vector
    * against `nBits` deterministic pseudo-random hyperplanes derived from
    * `seed` via [[rhpWeight]]. Used to block ANN / near-dup searches so
    * the cross join never materializes n².
    *
    * Hyperplanes depend only on (seed, k, i): precomputed on the driver
    * and embedded as literal arrays, so each row pays nBits·dim fused
    * multiply-adds instead of re-deriving weights per element per row.
    */
  def rhpSignature(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    val planes: Seq[Column] = (0 until nBits).map { k =>
      typedLit((0 until dim).map(i => rhpWeight(seed, k, dim, i).toDouble))
    }
    planes.foldLeft(lit(0L)) { (acc, p) =>
      acc * 2 + when(dotProduct(vec, p) > 0, 1L).otherwise(0L)
    }
  }
}
