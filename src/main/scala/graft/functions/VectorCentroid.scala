package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.B UDAF row): element-wise centroid of embedding
  * vectors via `Aggregator[IN, BUF, OUT]`. The buffer is (sum-vector, count);
  * merge is associative/commutative so Catalyst runs it as partial + final
  * aggregation (map-side combine — the property that makes it scale).
  */
object VectorCentroid extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) return b
    val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    val n = math.min(acc.length, v.length)
    while (i < n) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    val out = a._1.clone()
    var i = 0
    val n = math.min(out.length, b._1.length)
    while (i < n) { out(i) += b._1(i); i += 1 }
    (out, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
