package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** X3 (SURVEY §2.12): bounded top-k aggregator — the scale-correct form of
  * "top k per group". The window form (`row_number` + filter) shuffles
  * EVERY row to its group's reducer and sorts there; this aggregator keeps
  * a ≤k buffer per group on the map side, so the shuffle carries at most
  * k rows per group per partition — at 100 TB the difference between
  * shuffling the fact table and shuffling k·|groups| rows.
  *
  * Ordering: price desc, then key asc — a total order, so the result is
  * deterministic and oracle-comparable.
  */
final case class Ranked(price: Double, key: Long)

final class TopKByPrice(k: Int)
    extends Aggregator[Ranked, Seq[Ranked], Seq[Ranked]] {

  private def lt(a: Ranked, b: Ranked): Boolean =
    a.price > b.price || (a.price == b.price && a.key < b.key)

  private def insert(buf: Seq[Ranked], v: Ranked): Seq[Ranked] = {
    // buf is kept sorted (best first) and ≤ k long; short linear insert
    if (buf.length == k && !lt(v, buf.last)) buf
    else {
      val (pre, post) = buf.span(lt(_, v))
      (pre :+ v) ++ post.take(k - pre.length - 1)
    }
  }

  override def zero: Seq[Ranked] = Seq.empty
  override def reduce(b: Seq[Ranked], v: Ranked): Seq[Ranked] = insert(b, v)
  override def merge(a: Seq[Ranked], b: Seq[Ranked]): Seq[Ranked] =
    b.foldLeft(a)(insert)
  override def finish(r: Seq[Ranked]): Seq[Ranked] = r
  override def bufferEncoder: Encoder[Seq[Ranked]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ranked]]()
  override def outputEncoder: Encoder[Seq[Ranked]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ranked]]()
}
