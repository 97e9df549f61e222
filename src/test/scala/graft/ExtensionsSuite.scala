package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions is wired into the fixture session builder — these
  * queries must resolve WITHOUT any manual CosineSim.register call.
  */
class ExtensionsSuite extends AnyFunSuite with SparkFixture {

  test("cosine_sim resolves through SparkSessionExtensions") {
    val spark0 = spark
    import spark0.implicits._
    val r = Seq((Seq(1f, 0f), Seq(1f, 0f))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS c").collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("SimplifyLiteralRLike rewrites literal rlike to Contains, keeps real regex") {
    // non-foldable input — a literal would be constant-folded away before
    // the rewrite is observable in the optimized plan
    val df = spark.range(3)
      .select(concat(lit("the fast join "), col("id").cast("string")).as("s"))
      .selectExpr("s rlike 'fast join' AS lit_hit",
                  "s rlike 'scan' AS lit_miss",
                  "s rlike '(fast|slow) join' AS regex_kept")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("Contains(s"), s"literal rlike not rewritten:\n$opt")
    assert(opt.contains("RLIKE") && opt.contains("(fast|slow) join"),
      s"real regex must stay:\n$opt")
    val r = df.collect()
    assert(r.forall(_.getBoolean(0)) && r.forall(!_.getBoolean(1)) &&
           r.forall(_.getBoolean(2)))
  }

  test("dot_product rejects wrong element types with a clear error") {
    val spark0 = spark
    import spark0.implicits._
    val e = intercept[Exception] {
      Seq((Seq(1f), Seq(1f))).toDF("a", "b")
        .selectExpr("dot_product(a, b)").collect()
    }
    assert(e.getMessage.contains("dot_product expects"))
  }
}
