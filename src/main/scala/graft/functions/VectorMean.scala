package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** X3 (SURVEY.md §2.12): typed UDAF — element-wise mean of embedding
  * vectors. Register with `udaf(VectorMean)` and call as a Column, e.g.
  * per-label centroids over ArrayType(FloatType).
  *
  * The buffer is (element-sums, count): partial aggregation happens
  * map-side, the shuffle carries one 64-double buffer per group per
  * partition — the same partial→final shape as built-in aggregates, so it
  * scales like sum()/avg() rather than like collect_list().
  */
object VectorMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    // Heterogeneous dimensions would silently truncate to the first-seen
    // length — fail fast instead (a wrong-dim vector is corrupt input).
    require(v.length == sums.length,
      s"VectorMean: dimension mismatch (${v.length} vs ${sums.length})")
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"VectorMean: dimension mismatch (${a._1.length} vs ${b._1.length})")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
