package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic laws (SURVEY §5.3) — cheap to state, strong against
  * regressions. ScalaCheck generators driven with fixed seeds (the
  * scalatest-plus bridge isn't in the offline cache), each case runs
  * through the real engine.
  */
class PropertySuite extends AnyFunSuite with SparkFixture {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val smallInts = Gen.listOfN(30, Gen.choose(0, 8))

  test("Y27 safety matrix is a lattice: identity safe, no mutual-safe pair, safe composes") {
    import graft.sync.Migration.changeSafety
    import org.apache.spark.sql.types._
    // representative closure of the types the planner meets, including
    // the decimal corners (precision/scale interplay)
    val types: Seq[DataType] = Seq(ByteType, ShortType, IntegerType,
      LongType, FloatType, DoubleType, StringType, DateType,
      TimestampType, BinaryType, DecimalType(10, 0), DecimalType(19, 0),
      DecimalType(10, 2), DecimalType(12, 2), DecimalType(12, 4),
      DecimalType(38, 18))
    // (1) identity is safe (plan() never emits it, but the matrix must
    //     not call a no-op lossy)
    for (t <- types) assert(changeSafety(t, t) == "safe", s"$t -> $t")
    // (2) ANTISYMMETRY: two DISTINCT types are never mutually safe — a
    //     value-preserving cast cycle would mean equal value sets
    for (a <- types; b <- types if a != b)
      assert(!(changeSafety(a, b) == "safe" && changeSafety(b, a) == "safe"),
        s"mutually safe: $a <-> $b")
    // (3) TRANSITIVITY of preservation: safe ∘ safe is safe — a planner
    //     composing two safe migrations must not land on a lossy or
    //     manual step
    for (a <- types; b <- types; c <- types
         if a != b && b != c && a != c &&
           changeSafety(a, b) == "safe" && changeSafety(b, c) == "safe")
      assert(changeSafety(a, c) == "safe",
        s"safe chain broke: $a -> $b -> $c but $a -> $c = ${changeSafety(a, c)}")
  }

  test("exceptAll(a, a) is empty; |a exceptAll b| = |a| - |a ∩multiset b|") {
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.zip(smallInts, smallInts), 5).foreach { case (xs, ys) =>
      val a = xs.toDF("v"); val b = ys.toDF("v")
      assert(a.exceptAll(a).count() == 0)
      val inter = xs.groupBy(identity).map { case (k, v) =>
        math.min(v.size, ys.count(_ == k)) }.sum
      assert(a.exceptAll(b).count() == xs.size - inter)
    }
  }

  test("unionAll cardinality adds; union-distinct equals distinct of concat") {
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.zip(smallInts, smallInts), 5).foreach { case (xs, ys) =>
      val a = xs.toDF("v"); val b = ys.toDF("v")
      assert(a.unionAll(b).count() == xs.size + ys.size)
      assert(a.union(b).distinct().count() == (xs ++ ys).distinct.size)
    }
  }

  test("top-k via orderBy/limit equals sorted prefix") {
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.listOfN(40, Gen.choose(-1000, 1000)), 5).foreach { xs =>
      val df = xs.zipWithIndex.toDF("v", "id")
      val k = 5
      val topk = df.orderBy(col("v").desc, col("id").asc).limit(k)
        .collect().map(_.getInt(0)).toSeq
      val expected = xs.zipWithIndex.sortBy { case (v, i) => (-v, i) }
        .take(k).map(_._1)
      assert(topk == expected)
    }
  }

  test("r6 operator laws: histogram totals, PK-audit consistency, logprob bounds") {
    val sf = "/root/testdata/sf0.001"
    // a17: bucket counts partition the table; per-bucket min/max inside
    // the bucket bounds (tail bucket open-ended)
    val h = SparkEntry.queries("a17_histogram")(spark, sf).collect()
    val orders = graft.ops.Tables.orders(spark, sf)
    assert(h.map(_.getAs[Long]("n")).sum == orders.count())
    h.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(r.getAs[Double]("min_price") >= b * 25000.0)
      if (b < 19) assert(r.getAs[Double]("max_price") < (b + 1) * 25000.0)
    }
    // y11: the audit's key count equals the distinct key count, and its
    // duplicate verdict agrees with a direct computation
    val a = SparkEntry.queries("y11_pk_audit")(spark, sf).collect()(0)
    val li = graft.ops.Tables.lineitem(spark, sf)
    val nKeys = li.select("l_orderkey").distinct().count()
    assert(a.getAs[Long]("n_keys") == nKeys)
    assert(a.getAs[Long]("n_dup_keys") ==
      li.groupBy("l_orderkey").count().filter(col("count") > 1).count())
    assert(!a.getAs[Boolean]("pk_valid"), "l_orderkey is a deliberate non-key")
    // l5l: every doc's mean unigram log-prob is negative (probabilities
    // < 1) and perplexity = exp(-avg) within rounding of the emitted pair
    val lp = SparkEntry.queries("l5l_unigram_logprob")(spark, sf).collect()
    assert(lp.nonEmpty)
    lp.foreach { r =>
      val avg = r.getAs[Double]("avg_logp")
      assert(avg < 0.0 && r.getAs[Double]("ppl") > 1.0)
      assert(math.abs(r.getAs[Double]("ppl") - math.exp(-avg)) < 1e-3)
    }
  }

  test("Y3 diff partitions keys: I/D/U/S counts add up to each side") {
    val s = spark
    val diff = graft.ops.Sync.queries("y3_snapshot_diff")(s, "/root/testdata/sf0.001")
      .groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTgt = graft.ops.Tables.orders(s, "/root/testdata/sf0.001").count()
    val nSrc = graft.ops.Sync.sourceView(s, "/root/testdata/sf0.001").count()
    // every target key is D, U or S; every source key is I, U or S
    assert(diff.getOrElse("D", 0L) + diff.getOrElse("U", 0L) + diff.getOrElse("S", 0L) == nTgt)
    assert(diff.getOrElse("I", 0L) + diff.getOrElse("U", 0L) + diff.getOrElse("S", 0L) == nSrc)
  }

  test("Y5 upsert is idempotent: re-applying the same batch is a no-op") {
    // the law behind exactly-once foreachBatch sinks: a failed micro-batch
    // is RE-delivered with the same data, so apply∘apply must equal apply
    // (both incremental and deleteMissing modes)
    import graft.sync.SyncJob
    import graft.sync.SyncJob.SyncConfig
    val s = spark
    val d = "/root/testdata/sf0.001"
    val cfg = SyncConfig(Seq("o_orderkey"),
      Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
    val target = graft.ops.Tables.orders(s, d)
    val source = graft.ops.Sync.sourceView(s, d)
    for (c <- Seq(cfg, cfg.copy(deleteMissing = true))) {
      val once = SyncJob.upsert(source, target, c)
      val twice = SyncJob.upsert(source, once, c)
      assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty,
        s"upsert not idempotent (deleteMissing=${c.deleteMissing})")
    }
  }

  test("cosine similarity is symmetric and bounded on random vectors") {
    val spark0 = spark
    import spark0.implicits._
    val vecGen = Gen.listOfN(8, Gen.choose(-1.0, 1.0)).suchThat(_.exists(_ != 0))
    samples(Gen.zip(vecGen, vecGen), 5).foreach { case (u, v) =>
      val df = Seq((u, v)).toDF("u", "v")
      def dot(a: String, b: String) =
        aggregate(zip_with(col(a), col(b), (x, y) => x * y), lit(0d), (acc, x) => acc + x)
      val row = df.select(
        (dot("u", "v") / (sqrt(dot("u", "u")) * sqrt(dot("v", "v")))).as("c1"),
        (dot("v", "u") / (sqrt(dot("v", "v")) * sqrt(dot("u", "u")))).as("c2"))
        .collect()(0)
      assert(row.getDouble(0) == row.getDouble(1))
      assert(row.getDouble(0) >= -1.0 - 1e-9 && row.getDouble(0) <= 1.0 + 1e-9)
    }
  }

  test("shingle Jaccard is 1 on identical texts, in [0,1] always") {
    val spark0 = spark
    import spark0.implicits._
    val txt = Gen.listOfN(20, Gen.alphaLowerChar).map(_.mkString)
    samples(Gen.zip(txt, txt), 5).foreach { case (t1, t2) =>
      val df = Seq((t1, t2), (t1, t1)).toDF("a", "b")
      def sh(c: String) = array_distinct(transform(
        sequence(lit(1), greatest(length(col(c)) - 4, lit(1))),
        i => col(c).substr(i, lit(5))))
      val js = df.select((size(array_intersect(sh("a"), sh("b"))) /
        size(array_union(sh("a"), sh("b")))).as("j")).collect().map(_.getDouble(0))
      js.foreach(j => assert(j >= 0.0 && j <= 1.0))
      assert(js(1) == 1.0) // identical texts
    }
  }

  test("connectedComponents ≡ driver-side union-find on random graphs") {
    val spark0 = spark
    import spark0.implicits._
    val edgeGen = Gen.listOfN(20,
      Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)).suchThat(e => e._1 != e._2))
    samples(edgeGen, 5).foreach { edges =>
      // reference: classic union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      // union-find roots are not guaranteed minimal per component; remap
      val minOfRoot = expected.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
      val want = expected.map { case (v, r) => v -> minOfRoot(r) }
      val got = graft.ops.LlmPipeline
        .connectedComponents(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"edges=$edges")
      // threshold 0 forces the distributed stitch loop (label propagation
      // + pointer jumping) that production-scale graphs take — the
      // single-task contraction path must not be the only path tested
      val gotLoop = graft.ops.LlmPipeline
        .connectedComponents(edges.toDF("u", "v"), oneTaskThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLoop == want, s"loop path: edges=$edges")
    }
  }

  test("BoundedTopKExec ≡ sort-based top-k per group on random data") {
    val spark0 = spark
    import spark0.implicits._
    val rowGen = Gen.listOfN(40, Gen.zip(
      Gen.choose(0L, 4L), Gen.choose(0L, 999L), Gen.choose(0, 20)))
    samples(rowGen, 5).foreach { raw =>
      val rows = raw.map { case (g, id, v) => (g, id, v.toDouble) }
        .distinct // unique (g,id) pairs keep the tie-break total
      val df = rows.toDF("g", "id", "v")
      val got = graft.plans.BoundedTopK.perGroup(df, Seq("g"), "v", "id", 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = rows.groupBy(_._1).values.flatMap(
        _.sortBy(r => (-r._3, r._2)).take(3)).toSet
      assert(got == want, s"rows=$rows")
    }
  }

  test("incrementalAgg ≡ direct groupBy recompute on random mutations") {
    val spark0 = spark
    import spark0.implicits._
    // target: rows (pk, key, value); source: random subset deleted,
    // random values/keys rewritten, random new pks appended
    val tgtGen = Gen.listOfN(25, Gen.zip(
      Gen.choose(0L, 39L), Gen.choose(0L, 4L), Gen.choose(1, 999)))
    val mutGen = Gen.zip(tgtGen,
      Gen.listOfN(25, Gen.choose(0, 5)), // per-row action selector
      Gen.listOfN(8, Gen.zip(Gen.choose(100L, 139L), Gen.choose(0L, 4L),
        Gen.choose(1, 999))))
    samples(mutGen, 6).foreach { case (tRows0, acts, ins) =>
      val tRows = tRows0.groupBy(_._1).map(_._2.head).toList // unique pk
      val sRows = tRows.zip(acts).flatMap { case ((pk, k, v), a) =>
        a match {
          case 0 => Nil                        // delete
          case 1 => Seq((pk, k, v + 7))        // value update
          case 2 => Seq((pk, (k + 1) % 5, v))  // key move
          case _ => Seq((pk, k, v))            // unchanged
        }
      } ++ ins.groupBy(_._1).map(_._2.head)    // unique inserted pks
      // key 4 becomes NULL: groupBy treats NULL as a group, and the
      // kernel must track moves in/out of it (null-safe comparisons)
      def nullify(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("k", when(col("k") === 4, lit(null)).otherwise(col("k")))
      val t = nullify(tRows.map { case (p, k, v) => (p, k, v / 100.0) }
        .toDF("pk", "k", "v"))
      val s = nullify(sRows.map { case (p, k, v) => (p, k, v / 100.0) }
        .toDF("pk", "k", "v"))
      def keyOf(r: org.apache.spark.sql.Row) =
        if (r.isNullAt(0)) -1L else r.getLong(0)
      val got = graft.ops.Sync.incrementalAgg(s, t, "pk", "k", "v")
        .collect().map(r => (keyOf(r), r.getDouble(1), r.getLong(2)))
        .toSet
      val want = s.groupBy(col("k"))
        .agg(graft.ops.Det.dsum(col("v")).as("sum_value"),
             org.apache.spark.sql.functions.count(
               org.apache.spark.sql.functions.lit(1)).as("n_rows"))
        .collect().map(r => (keyOf(r), r.getDouble(1), r.getLong(2)))
        .toSet
      assert(got == want, s"t=$tRows s=$sRows")
    }
  }

  test("TopKByPrice ≡ sort-and-take-k for any insert/merge split") {
    import graft.functions.{Ranked, TopKByPrice}
    val agg = new TopKByPrice(3)
    val rows = Gen.listOfN(25,
      Gen.zip(Gen.choose(0, 9), Gen.choose(0L, 99L)).map { case (p, k) =>
        Ranked(p.toDouble, k) })
    samples(Gen.zip(rows, Gen.choose(0, 25)), 10).foreach { case (vs, cut) =>
      // duplicates are kept, like row_number keeps duplicate rows
      val expected = vs.sortBy(r => (-r.price, r.key)).take(3)
      val (l, r) = vs.splitAt(cut % (vs.size + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == expected, s"merged=$merged expected=$expected")
    }
  }
}
