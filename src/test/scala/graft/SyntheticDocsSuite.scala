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

  test("pushed doc_id range clamps the planned splits (split-level pruning)") {
    // 2000 docs / 8 partitions = 250-doc splits; [900, 1100) overlaps
    // exactly two splits ([750,1000) and [1000,1250)), each trimmed to
    // the clamp — the DSv2 analogue of JDBC partition predicates
    val df = docs(2000, 8)
      .filter(col("doc_id") >= 900 && col("doc_id") < 1100)
    assert(df.rdd.getNumPartitions == 2,
      s"expected 2 planned splits, got ${df.rdd.getNumPartitions}")
    val ids = df.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (900L until 1100L),
      "pushed range must be enforced exactly (Spark adds no re-check)")
    // the full-scan twin agrees
    assert(docs(2000, 8).filter(col("doc_id") >= 900 && col("doc_id") < 1100)
      .count() == 200)
  }

  test("pushed lang equality is enforced in the reader, other filters stay post-scan") {
    val base = docs(1000, 4)
    val viaPush = base.filter(col("lang") === "de")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // client-side twin computed WITHOUT the pushable shape (guard rows
    // through an opaque filter Spark cannot push to the source)
    val twin = base.filter(length(col("lang")) === 2 && col("lang") === "de")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaPush == twin && viaPush.nonEmpty,
      "reader-side lang pushdown must match the post-scan evaluation")
    // an unsupported predicate (on text) is handed back and still applies
    val mixed = base.filter(col("lang") === "en" && col("text").contains("sync"))
    assert(mixed.collect().forall(r =>
      r.getString(1) == "en" && r.getString(2).contains("sync")))
  }

  test("contradictory pushed filters yield an empty scan, not last-one-wins") {
    // both equalities are ACCEPTED (no post-scan re-check), so the
    // source must intersect them: two different lang values — or a
    // doc_id equality outside a pushed range — can match nothing
    assert(docs(500, 4).filter(col("lang") === "en")
      .filter(col("lang") === "de").count() == 0)
    assert(docs(500, 4).filter(col("doc_id") === 100)
      .filter(col("doc_id") < 50).count() == 0)
    // saturation guard: an always-true inclusive bound must not overflow
    // the clamp into an empty scan
    assert(docs(500, 4).filter(col("doc_id") <= Long.MaxValue).count() == 500)
  }

  test("the source feeds ordinary operators (joins the parquet corpus)") {
    val synth = docs(200, 4).select(col("doc_id"), col("lang").as("synth_lang"))
    val real = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"))
    val joined = synth.join(real, "doc_id")
    assert(joined.count() > 0)
  }
}
