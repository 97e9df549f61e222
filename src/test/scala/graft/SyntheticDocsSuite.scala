package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSourceV2 connector checks: partition planning, determinism across
  * reads/parallelism, and column pruning reaching the custom scan.
  */
class SyntheticDocsSuite extends AnyFunSuite with SparkFixture {

  private def docs(n: Long, parts: Int) =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("numDocs", n).option("numPartitions", parts).load()

  test("plans the requested partitions and yields exactly numDocs rows") {
    val df = docs(1000, 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 1000)
    assert(df.agg(countDistinct(col("doc_id"))).collect()(0).getLong(0) == 1000)
  }

  test("content is deterministic and independent of parallelism") {
    val a = docs(500, 2).orderBy("doc_id").collect()
    val b = docs(500, 7).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getString(1).nonEmpty && r.getString(2).nonEmpty))
  }

  test("column pruning reaches the custom scan (ReadSchema shrinks)") {
    val df = docs(100, 2).select("doc_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("doc_id"))
    assert(!scan.contains("text"), s"text not pruned from custom scan:\n$scan")
    assert(df.agg(sum("doc_id")).collect()(0).getLong(0) == 4950L)
  }

  test("the source feeds ordinary operators (joins the parquet corpus)") {
    val synth = docs(200, 4).select(col("doc_id"), col("lang").as("synth_lang"))
    val real = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"))
    val joined = synth.join(real, "doc_id")
    assert(joined.count() > 0)
  }
}
