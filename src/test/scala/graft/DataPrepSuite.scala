package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the DataPrep screening/planning family, computed
  * against an independent plain-Scala reimplementation on real corpus rows
  * (the DuckDB oracle already pins full-output parity; these pin the
  * *semantics* against a second, non-SQL derivation).
  */
class DataPrepSuite extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def toks(text: String): Array[String] =
    text.toLowerCase.split(" +").filter(_.nonEmpty)

  test("L5j repetition: ratios match a plain-Scala recount on sample docs") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").filter(col("doc_id") < 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = DataPrep.queries("l5j_repetition")(spark, sf)
      .filter(col("doc_id") < 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      val t = toks(text)
      val counts = t.groupBy(identity).view.mapValues(_.length)
      val bg = t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toArray
      val r = got(id)
      assert(r.getLong(1) == t.length.toLong, s"n_toks doc $id")
      assert(r.getDouble(2) ==
        math.rint(counts.size.toDouble / t.length * 1e6) / 1e6, s"distinct doc $id")
      assert(r.getDouble(3) ==
        math.rint(counts.values.max.toDouble / t.length * 1e6) / 1e6, s"top doc $id")
      val dup = if (bg.isEmpty) 0.0
        else math.rint((bg.length - bg.distinct.length).toDouble / bg.length * 1e6) / 1e6
      assert(r.getDouble(4) == dup, s"dup_bigram doc $id")
    }
  }

  test("L10 contamination: eval docs excluded; hits bounded; self-overlap sanity") {
    val out = DataPrep.queries("l10_contamination")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) % 97 != 0, "benchmark doc leaked into output")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1), "n_hit bounds")
    }
  }

  test("L11 split: partition of the corpus, deterministic across runs") {
    val out = DataPrep.queries("l11_split")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = Tables.documents(spark, sf).count()
    assert(out.values.sum == total, "splits must partition the corpus")
    assert(out.keys.map(_._2).forall(Set("train", "val", "test")))
    val again = DataPrep.queries("l11_split")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(again == out, "content-hash split must be stable")
  }

  test("L11 split: assignment is subset-independent (the prod re-run property)") {
    // the same doc must land in the same split whether the job sees the
    // whole corpus or any slice of it — that is what makes a hash split
    // reproducible across incremental runs
    val h = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 100
    val sp = when(h < 80, "train").when(h < 90, "val").otherwise("test")
    def assign(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), sp.as("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = assign(Tables.documents(spark, sf))
    val slice = assign(Tables.documents(spark, sf).filter(col("doc_id") % 3 === 1))
    assert(slice.nonEmpty)
    slice.foreach { case (id, s) => assert(full(id) == s, s"doc $id moved splits") }
  }

  test("L12 domain mix: shares sum to 1, expected never exceeds available") {
    val rows = DataPrep.queries("l12_domain_mix")(spark, sf).collect()
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"share sum $shareSum")
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0, "rate in (0,1]")
      assert(r.getLong(5) <= r.getLong(2), "expected_chars <= n_chars")
    }
  }

  test("A15 approx_top_k: exact regime equals the exact GROUP BY counts") {
    val sketch = DataPrep.queries("a15_approx_top_k")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (item, cnt) => (-cnt, item) }
    assert(sketch.toSeq == exact.toSeq)
  }
}
