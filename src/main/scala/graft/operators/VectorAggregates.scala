package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator for dense-vector means (SURVEY §7.3's "custom
  * Aggregator" slot): the partial state is an exact (running sum,
  * count) pair — associative and commutative, so map-side partials
  * combine freely across partitions — finished into the mean vector.
  * Powers cell/cluster centroid computation (IVF refresh, relational
  * centroid maintenance) without ever collecting vectors.
  */
object VectorAggregates {

  final case class VecSum(sum: Array[Double], n: Long)

  final class MeanVector extends Aggregator[Array[Float], VecSum, Array[Float]] {
    override def zero: VecSum = VecSum(Array.empty, 0L)

    override def reduce(b: VecSum, a: Array[Float]): VecSum =
      if (b.n == 0) VecSum(a.map(_.toDouble), 1L)
      else {
        var i = 0
        while (i < b.sum.length) { b.sum(i) += a(i); i += 1 }
        VecSum(b.sum, b.n + 1)
      }

    override def merge(x: VecSum, y: VecSum): VecSum =
      if (x.n == 0) y
      else if (y.n == 0) x
      else {
        var i = 0
        while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
        VecSum(x.sum, x.n + y.n)
      }

    override def finish(r: VecSum): Array[Float] =
      if (r.n == 0) Array.empty else r.sum.map(x => (x / r.n).toFloat)

    override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
    override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
  }

  /** Column form for DataFrame.agg over an array<float> column. */
  def meanVectorCol(vec: Column): Column = udaf(new MeanVector).apply(vec)
}
