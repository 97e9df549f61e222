package graft

import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing (SURVEY §4 / task "co-located joins"): pre-shuffling both
  * fact tables into the same bucket layout removes the exchange from every
  * subsequent join on the bucket key — at 100 TB that is THE technique for
  * repeated fact-fact joins.
  */
class BucketingSuite extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b"); spark.sql("DROP TABLE IF EXISTS ord_b")

    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")

    val j = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = j.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"))
    // the join itself must read bucketed data with no Exchange under it
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join must not reshuffle:\n$plan")

    // and it must still be correct
    val viaBuckets = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBuckets == direct)
  }
}
