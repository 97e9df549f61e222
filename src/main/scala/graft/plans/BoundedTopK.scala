package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** SURVEY §2.12 X7 — the full custom-operator extension path (logical node
  * → planner strategy → physical operator), demonstrated on top-k per
  * group. The composed forms already cover the semantics (O5 window
  * row_number; o5b bounded Aggregator); this is the third rung of the
  * builder-preference ladder for when an operator's PHYSICAL execution,
  * not just its result, needs to differ from anything Catalyst plans.
  *
  * Why this physical shape matters at 100 TB: the window form sorts every
  * (group-hash) shuffle partition in full — O(n log n) per partition and
  * the whole partition must fit the sorter's spill machinery. This
  * operator holds one k-slot min-heap per group instead: one pass,
  * O(groups × k) memory, nothing spills, and rows beyond the k-boundary
  * are dropped on sight. Requires only ClusteredDistribution on the group
  * keys, so Catalyst still plans (and AQE still tunes) the exchange.
  */
final case class BoundedTopKPlan(
    groupCols: Seq[Expression],
    orderCol: Expression,
    tieCol: Expression,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): BoundedTopKPlan =
    copy(child = newChild)
}

object BoundedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BoundedTopKPlan(g, o, t, k, child) =>
      BoundedTopKExec(g, o, t, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Keeps, per group, the k rows with the largest (orderCol, -tieCol) —
  * i.e. orderCol descending with tieCol ascending as the deterministic
  * tie-break. orderCol must be cast to DoubleType and tieCol to LongType
  * by the caller (perGroup does this), so any numeric — including
  * DecimalType, which is not a java.lang.Number — arrives as a plain
  * Double/Long. Rows where either evaluates to null are excluded, like a
  * WHERE-pruned top-k (a null can't rank deterministically).
  */
final case class BoundedTopKExec(
    groupCols: Seq[Expression],
    orderCol: Expression,
    tieCol: Expression,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): BoundedTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val gExprs = groupCols
    val oExpr = orderCol
    val tExpr = tieCol
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val ordBound = BindReferences.bindReference(oExpr, childOutput)
      val tieBound = BindReferences.bindReference(tExpr, childOutput)
      // "bigger wins": order value desc, then tie asc
      val ord = new Ordering[(Double, Long, InternalRow)] {
        override def compare(a: (Double, Long, InternalRow),
                             b: (Double, Long, InternalRow)): Int = {
          val c = java.lang.Double.compare(a._1, b._1)
          if (c != 0) c else java.lang.Long.compare(b._2, a._2)
        }
      }
      // PriorityQueue dequeues the max of its ordering; reversed, the head
      // is the weakest kept row — the eviction candidate.
      val heaps = mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[(Double, Long, InternalRow)]]()
      iter.foreach { row =>
        val v = ordBound.eval(row)
        val tv = tieBound.eval(row)
        if (v != null && tv != null) {
          val d = v.asInstanceOf[Double]
          val t = tv.asInstanceOf[Long]
          val heap = heaps.getOrElse(keyProj(row), null) match {
            case null =>
              val h = mutable.PriorityQueue.empty[(Double, Long, InternalRow)](ord.reverse)
              heaps.put(keyProj(row).copy(), h)
              h
            case h => h
          }
          if (heap.size < kk) heap.enqueue((d, t, row.copy()))
          else if (ord.compare((d, t, null), heap.head) > 0) {
            heap.dequeue(); heap.enqueue((d, t, row.copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(
        _.dequeueAll[(Double, Long, InternalRow)].iterator.map(_._3))
    }
  }
}

/** DataFrame-level entry: `BoundedTopK.perGroup(df, Seq("g"), "v", "id", 3)`
  * keeps the 3 rows with largest v (ties broken by smallest id) per g.
  * Planned by [[BoundedTopKStrategy]] (injected via GraftExtensions).
  */
object BoundedTopK {
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
               tieCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val analyzed = df.queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no such column: $n"))
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // self-contained in any session: GraftExtensions injects the strategy
    // at session build, but plain sessions get it here at first use
    if (!spark.experimental.extraStrategies.contains(BoundedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ BoundedTopKStrategy
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{DoubleType, LongType}
    org.apache.spark.sql.graftshim.PlanShim.ofRows(spark,
      BoundedTopKPlan(groupCols.map(attr),
        Cast(attr(orderCol), DoubleType), Cast(attr(tieCol), LongType),
        k, analyzed))
  }
}
