package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** X1 (SURVEY §2.12): the scalar `udf()` surface — registered here to
  * cover the API, and deliberately absent from every scored query. A
  * Scala UDF is an optimizer-opaque black box to everything below the
  * JVM row boundary: it cannot be translated into a parquet row-group
  * filter (PushedFilters stays empty, so a 100 TB scan reads every
  * row-group before the predicate runs), cannot be constant-folded, and
  * every invocation crosses a null-check + boxing boundary.
  * PlanAuditSuite ("X1: ...") pins the concrete cost on this exact
  * function: the identical predicate written as a built-in comparison
  * reaches PushedFilters; the UDF form leaves it empty. (Noted while
  * pinning: partition-VALUE pruning does survive a deterministic UDF —
  * the driver evaluates it against partition metadata — which is why the
  * audit targets data-column pushdown, the path that actually touches
  * bytes at scale.)
  */
object UdfDemo {
  /** Greater-than predicate in UDF form (the audited anti-pattern; the
    * built-in twin is simply `col > lit(threshold)`).
    */
  val gtUdf: UserDefinedFunction = udf((v: Double, threshold: Double) => v > threshold)

  def register(s: SparkSession): Unit = {
    s.udf.register("gt_udf", gtUdf)
    ()
  }
}
