package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** A CDC change-log row for the streaming lake-apply law (top-level so
  * the MemoryStream encoder derives cleanly). */
case class Chg(o_orderkey: Long, o_custkey: Long, o_totalprice: Double,
               op: String, version: Long)

/** T1–T8 (SURVEY §2.10) driven through MemoryStream micro-batches — the
  * only way to observe watermark/late-data/state semantics (no SQL oracle
  * can run a stream).
  */
class StreamingSuite extends AnyFunSuite with SparkFixture {
  import StreamOps._

  private val T0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(min: Int) = new Timestamp(T0 + min * 60000L)
  private def ev(id: Long, min: Int, user: Long, typ: String, v: Double) =
    Event(id, ts(min), user, typ, v)

  private def runToSink(name: String)(build: MemoryStream[Event] => org.apache.spark.sql.DataFrame,
                                      batches: Seq[Seq[Event]],
                                      mode: OutputMode = OutputMode.Append()) = {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val src = MemoryStream[Event]
    val q = build(src).writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("T1+T4 tumbling window emits on watermark pass; late row dropped") {
    val rows = runToSink("t1")(
      s => tumblingCounts(s.toDF()),
      Seq(
        Seq(ev(1, 10, 1, "view", 1.0), ev(2, 20, 1, "view", 2.0)),
        // watermark = max(ts) - 10min; 100min pushes it past the 0:00-1:00 end
        Seq(ev(3, 100, 1, "click", 1.0)),
        // late arrival inside the already-closed hour-0 window → dropped
        Seq(ev(4, 30, 1, "view", 99.0)),
        Seq(ev(5, 200, 1, "click", 1.0))))
    val hour0 = rows.filter(_.getAs[Timestamp]("wstart").getTime == T0)
    assert(hour0.length == 1)
    assert(hour0.head.getAs[Long]("n") == 2)          // late row NOT counted
    assert(hour0.head.getAs[Double]("sum_value") == 3.0)
  }

  test("T2 sliding windows: each event lands in 4 overlapping windows") {
    val rows = runToSink("t2")(
      s => slidingCounts(s.toDF()),
      Seq(Seq(ev(1, 40, 7, "view", 1.0)), Seq(ev(2, 300, 7, "view", 1.0))))
    val forUser = rows.filter(r => r.getAs[Long]("user_id") == 7 &&
      r.getAs[Timestamp]("wstart").getTime <= T0 + 40 * 60000L)
    assert(forUser.map(_.getAs[Long]("n")).sum == 4)
  }

  test("T3 session window merges events within gap, splits across it") {
    val rows = runToSink("t3")(
      s => sessionCounts(s.toDF()),
      Seq(
        Seq(ev(1, 0, 1, "view", 1.0), ev(2, 10, 1, "view", 2.0),
            ev(3, 70, 1, "view", 4.0)), // 60min gap > 30min → new session
        Seq(ev(4, 300, 1, "click", 0.0)))) // advance watermark, close both
    val sessions = rows.filter(_.getAs[Long]("user_id") == 1)
      .map(r => (r.getAs[Timestamp]("session_start").getTime - T0) / 60000L ->
        r.getAs[Long]("n_events")).toMap
    assert(sessions(0L) == 2 && sessions(70L) == 1)
  }

  test("T5 dedupWithinWatermark drops replayed event_ids") {
    val rows = runToSink("t5")(
      s => dedupWithinWatermark(s.toDF()),
      Seq(
        Seq(ev(1, 10, 1, "view", 1.0), ev(1, 10, 1, "view", 1.0)),
        Seq(ev(1, 11, 1, "view", 1.0), ev(2, 12, 1, "click", 2.0))))
    assert(rows.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L))
  }

  test("T6 stream-stream join binds purchases to prior-hour views only") {
    val rows = runToSink("t6")(
      s => purchaseViewJoin(s.toDF()),
      Seq(
        Seq(ev(10, 0, 1, "view", 0.0),   // 100 min before purchase → outside 1h
            ev(11, 80, 1, "view", 0.0),  // 20 min before → inside
            ev(12, 100, 1, "purchase", 5.0),
            ev(13, 110, 1, "view", 0.0)), // after purchase → excluded
        Seq(ev(14, 400, 1, "click", 0.0))))
    assert(rows.map(_.getAs[Long]("v_id")).toSeq == Seq(11L))
  }

  test("T6c stream-stream LEFT OUTER join emits unmatched purchases after the watermark") {
    // user 1 purchases with a prior-hour view → joined row; user 2
    // purchases with NO view in window → must still emit, with null view
    // columns, once the watermark passes the join window (batch 2 pushes
    // it far enough). An inner join would silently drop user 2's row.
    val rows = runToSink("t6c")(
      s => purchaseViewJoin(s.toDF(), joinType = "left_outer"),
      Seq(
        Seq(ev(10, 80, 1, "view", 0.0),
            ev(11, 100, 1, "purchase", 5.0),
            ev(12, 100, 2, "purchase", 7.0)), // no view for user 2
        // advance BOTH branch watermarks (each watermark node sits above
        // its event_type filter, so a click would advance neither) …
        Seq(ev(13, 400, 3, "view", 0.0), ev(14, 400, 3, "purchase", 1.0)),
        // … and one more micro-batch: outer-null rows are evicted+emitted
        // in the batch AFTER the watermark update lands
        Seq(ev(15, 401, 3, "view", 0.0), ev(16, 401, 3, "purchase", 1.0))))
    val byUser = rows.groupBy(_.getAs[Long]("p_user"))
    assert(byUser(1L).map(_.getAs[Long]("v_id")).toSeq == Seq(10L))
    val u2 = byUser(2L)
    assert(u2.length == 1 && u2.head.isNullAt(u2.head.fieldIndex("v_id")),
      s"unmatched purchase must emit once with null view cols: ${u2.toSeq}")
  }

  test("T6d stream-stream FULL OUTER join emits unmatched rows on BOTH sides") {
    // full outer = T6c's held-purchase semantics PLUS the symmetric case:
    // a view that never finds a purchase must also emit (null purchase
    // cols) once the watermark proves no matching purchase can arrive
    val rows = runToSink("t6d")(
      s => purchaseViewJoin(s.toDF(), joinType = "full_outer"),
      Seq(
        Seq(ev(10, 80, 1, "view", 0.0),
            ev(11, 100, 1, "purchase", 5.0),
            ev(12, 100, 2, "purchase", 7.0),  // no view for user 2
            ev(17, 90, 4, "view", 0.0)),      // no purchase for user 4
        Seq(ev(13, 400, 3, "view", 0.0), ev(14, 400, 3, "purchase", 1.0)),
        Seq(ev(15, 401, 3, "view", 0.0), ev(16, 401, 3, "purchase", 1.0))))
    val u1 = rows.filter(r =>
      !r.isNullAt(r.fieldIndex("p_user")) && r.getAs[Long]("p_user") == 1L)
    assert(u1.length == 1 && u1.head.getAs[Long]("v_id") == 10L)
    val u2 = rows.filter(r =>
      !r.isNullAt(r.fieldIndex("p_user")) && r.getAs[Long]("p_user") == 2L)
    assert(u2.length == 1 && u2.head.isNullAt(u2.head.fieldIndex("v_id")),
      s"unmatched purchase must emit once with null view cols: ${u2.toSeq}")
    val u4 = rows.filter(r =>
      !r.isNullAt(r.fieldIndex("v_user")) && r.getAs[Long]("v_user") == 4L)
    assert(u4.length == 1 && u4.head.isNullAt(u4.head.fieldIndex("p_id")),
      s"unmatched view must emit once with null purchase cols: ${u4.toSeq}")
  }

  test("T7c flatMapGroupsWithState ProcessingTimeTimeout flushes idle users") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val src = MemoryStream[Event]
    val q = StreamOps.idleFlushCounts(src.toDS(), idleMs = 200).toDF()
      .writeStream.format("memory").queryName("t7c")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      src.addData(ev(1, 0, 1, "view", 1.0), ev(2, 10, 1, "view", 2.0))
      // do NOT processAllAvailable here: a registered ProcessingTimeTimeout
      // makes FlatMapGroupsWithStateExec report shouldRunAnotherBatch, so
      // the engine schedules a batch after every batch and the no-new-data
      // latch processAllAvailable waits on never latches (observed: the
      // call livelocks at 150% CPU). The same re-batching is what fires
      // the timer with no further input — so just poll the sink.
      var rows = Array.empty[org.apache.spark.sql.Row]
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!rows.exists(_.getAs[Long]("user_id") == 1L) &&
             System.nanoTime() < deadline) {
        Thread.sleep(200)
        rows = spark.table("t7c").collect()
      }
      val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
      // on timeout, report the query's own progress: a host stall shows
      // up as batches still advancing (durationMs inflated) vs a real
      // timer regression where batches run but never emit the flush
      assert(u1.length == 1,
        s"idle user 1 must flush exactly once: ${rows.toSeq}; " +
          s"lastProgress=${Option(q.lastProgress).map(_.json).getOrElse("none")}")
      assert(u1.head.getAs[Int]("n_events") == 2)
      assert(u1.head.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("T6b stream-static join enriches events from a batch dimension") {
    // The dimension-enrich shape: the static side is re-read per micro-batch
    // (no state store involved), so broadcast applies exactly as in batch.
    val spark0 = spark
    import spark0.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val rows = runToSink("t6b")(
      s => s.toDF().join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
        .select($"event_id", $"user_id", $"tier"),
      Seq(Seq(ev(1, 1, 1, "view", 1.0), ev(2, 2, 2, "view", 1.0),
              ev(3, 3, 7, "view", 1.0))))
    val byId = rows.map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(byId(1L).contains("gold") && byId(2L).contains("basic"))
    assert(byId(3L).isEmpty, "unmatched user must keep the row with null tier")
  }

  test("T7 flatMapGroupsWithState emits session summary on event-time timeout") {
    val spark0 = spark
    import spark0.implicits._
    val rows = runToSink("t7")(
      s => StreamOps.sessionize(s.toDS()).toDF(),
      Seq(
        Seq(ev(1, 0, 1, "view", 1.0), ev(2, 10, 1, "view", 2.5)),
        Seq(ev(3, 120, 2, "view", 1.0)),   // watermark → 110min: closes user 1
        Seq(ev(4, 300, 2, "view", 1.0))))  // closes user 2's first session
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1)
    assert(u1.length == 1)
    assert(u1.head.getAs[Int]("n_events") == 2)
    assert(u1.head.getAs[Double]("total_value") == 3.5)
  }

  test("W7 batch sessionization ≡ T7 streaming sessionize on the real corpus") {
    // The batch-twin law for stateful sessionization: the w7 window
    // query and the flatMapGroupsWithState stream must carve the SAME
    // corpus into the SAME sessions. All real events arrive in one
    // ordered batch; two far-future sentinel batches push the watermark
    // so every real session closes via the event-time timeout path too
    // (both emission paths exercised). Multiset compare keyed on
    // (user, first_ts): count, last_ts exact; total_value within 1e-6
    // (w7 rounds through the Det decimal detour, the stream sums raw).
    val spark0 = spark
    import spark0.implicits._
    val evs = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val maxTs = evs.map(_.ts.getTime).max
    val day = 86400000L
    val streamed = runToSink("w7twin")(
      s => StreamOps.sessionize(s.toDS()).toDF(),
      Seq(evs,
        Seq(Event(-1L, new Timestamp(maxTs + 10 * day), -1L, "view", 0.0)),
        Seq(Event(-2L, new Timestamp(maxTs + 20 * day), -1L, "view", 0.0))))
      .filter(_.getAs[Long]("user_id") >= 0)
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("first_ts")) ->
        (r.getAs[Int]("n_events").toLong, r.getAs[Timestamp]("last_ts"),
          r.getAs[Double]("total_value"))).toMap
    val batch = SparkEntry.queries("w7_sessionize")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("first_ts")) ->
        (r.getAs[Long]("n_events"), r.getAs[Timestamp]("last_ts"),
          r.getAs[Double]("total_value"))).toMap
    assert(streamed.keySet == batch.keySet,
      s"session sets diverge: only-stream=${streamed.keySet -- batch.keySet} " +
        s"only-batch=${batch.keySet -- streamed.keySet}")
    for ((k, (bn, bl, bv)) <- batch) {
      val (sn, sl, sv) = streamed(k)
      assert(sn == bn && sl == bl, s"session $k diverged: ($sn,$sl) vs ($bn,$bl)")
      assert(math.abs(sv - bv) < 1e-6, s"session $k value: $sv vs $bv")
    }
  }

  test("streaming DQ gate: violations quarantine, clean rows pass, per-batch report audits") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_dq").toString
    val (clean, quar, rep) = (s"$base/clean", s"$base/quar", s"$base/rep")
    val checks = Seq(
      graft.ops.Quality.InRange("value", 0, 10),
      graft.ops.Quality.InSet("event_type", Seq("view", "click")))
    val src = MemoryStream[Event]
    val q = StreamOps.dqGate(src.toDF(), checks, clean, quar, rep)
      .option("checkpointLocation", s"$base/ck").start()
    try {
      // batch 0: one range violation; batch 1: one set violation + clean
      src.addData(ev(1, 1, 1, "view", 5.0), ev(2, 2, 1, "view", 99.0))
      q.processAllAvailable()
      src.addData(ev(3, 3, 2, "purchase", 1.0), ev(4, 4, 2, "click", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val cleanIds = spark.read.parquet(clean)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val quarIds = spark.read.parquet(quar)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(cleanIds == Set(1L, 4L), s"clean routing broke: $cleanIds")
    assert(quarIds == Set(2L, 3L), s"quarantine routing broke: $quarIds")
    // report: one row per check per batch, violations counted per batch
    val report = spark.read.parquet(rep).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("constraint")) ->
        r.getAs[Long]("violations")).toMap
    assert(report((0L, "in_range(value)")) == 1L)
    assert(report((0L, "in_set(event_type)")) == 0L)
    assert(report((1L, "in_set(event_type)")) == 1L)
    assert(report.size == 4, s"expected 2 checks x 2 batches: $report")
  }

  test("S8 rate-micro-batch source drives a deterministic pipeline") {
    val df = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 10).option("numPartitions", 2)
      .load() // schema: (timestamp, value)
    val q = df.selectExpr("value % 3 AS k")
      .writeStream.format("memory").queryName("s8_rate")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(30000)
    val n = spark.table("s8_rate").count()
    assert(n >= 10, s"expected at least one 10-row micro-batch, got $n")
  }

  test("S9 parquet file sink + checkpoint recovers exactly-once across a restart") {
    // The durability story a real pipeline needs (SURVEY §2.10 T8): a
    // file-source → parquet-sink query with a checkpointLocation is
    // stopped cold, new input arrives while it is down, and a RESTARTED
    // query (same checkpoint) must emit exactly the missed rows — no
    // replays of batch 1, no losses.
    val spark0 = spark
    import spark0.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    new java.io.File(in).mkdirs()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.mode("append").json(in)
    def start() = spark.readStream.schema("id LONG, s STRING").json(in)
      .withColumn("twice", org.apache.spark.sql.functions.col("id") * 2)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 2)
    // input lands while the query is down
    Seq((3L, "c")).toDF("id", "s").coalesce(1).write.mode("append").json(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("twice"))
    assert(rows.length == 3, s"exactly-once violated: ${rows.toSeq}")
    assert(rows.toMap == Map(1L -> 2L, 2L -> 4L, 3L -> 6L))
  }

  test("S8b Trigger.AvailableNow drains the backlog then stops (incremental batch runs)") {
    // The scheduled-batch ingestion pattern at 100 TB: a periodic job
    // starts the same checkpointed query with Trigger.AvailableNow, which
    // processes exactly the files that arrived since the last run and
    // then terminates itself — incremental sync without a resident
    // streaming cluster.
    val spark0 = spark
    import spark0.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_avnow").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    new java.io.File(in).mkdirs()
    def runOnce(): Unit = {
      val q = spark.readStream.schema("id LONG, s STRING").json(in)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
      assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    }
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.mode("append").json(in)
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    Seq((3L, "c")).toDF("id", "s").coalesce(1).write.mode("append").json(in)
    runOnce() // the next scheduled run picks up ONLY the new file
    val ids = spark.read.parquet(out).collect().map(_.getAs[Long]("id")).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("T8+Y5 foreachBatch upsert MERGEs into JDBC target (Derby), no driver collect") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val dbPath = java.nio.file.Files.createTempDirectory("graft_upsert").resolve("db")
    val url = s"jdbc:derby:$dbPath;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE upsert_t (user_id BIGINT PRIMARY KEY, " +
      "event_type VARCHAR(32), val DOUBLE)")
    conn.createStatement().execute( // pre-existing row survives (no delete)
      "INSERT INTO upsert_t VALUES (99, 'seed', 0.0)")
    conn.close()
    val src = MemoryStream[Event]
    val q = StreamOps.upsertToJdbc(src.toDF(), url, "upsert_t", driver).start()
    try {
      src.addData(ev(1, 0, 1, "view", 1.0), ev(2, 5, 1, "click", 2.0))
      q.processAllAvailable()
      src.addData(ev(3, 10, 1, "purchase", 7.0), ev(4, 10, 2, "signup", 0.5))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format("jdbc")
      .options(Map("url" -> url, "dbtable" -> "upsert_t", "driver" -> driver))
      .load().collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(back(1L) == ("purchase", 7.0)) // latest-wins across batches
    assert(back(2L) == ("signup", 0.5))
    assert(back(99L) == ("seed", 0.0))
  }

  test("CDC lifecycle: changelog stream → stateful latest-wins → MERGE into Derby → validate, with restart + drift") {
    // The reference's end-to-end story composed as ONE flow (r5 verdict
    // item 3): a file-source changelog stream runs through the
    // transformWithState latest-wins guard into a Derby MERGE/DELETE
    // sink, is stopped cold mid-stream, restarted from its checkpoint
    // against new files (one carrying an out-of-order STALE version that
    // the recovered state must suppress), then the synced target is
    // Y6-validated against the expected snapshot and finally pushed
    // through a Y10 schema-drift sync.
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
      val in = s"$base/in"; val ck = s"$base/ck"
      new java.io.File(in).mkdirs()
      val url = s"jdbc:derby:$base/db;create=true"
      val driver = "org.apache.derby.jdbc.EmbeddedDriver"
      Class.forName(driver)
      val conn = java.sql.DriverManager.getConnection(url)
      conn.createStatement().execute(
        "CREATE TABLE cdc_t (k BIGINT PRIMARY KEY, v VARCHAR(32), ver BIGINT)")
      conn.createStatement().execute("INSERT INTO cdc_t VALUES (1, 'a0', 0)")
      conn.createStatement().execute("INSERT INTO cdc_t VALUES (2, 'b0', 0)")
      conn.close()
      def runOnce(): Unit = {
        val src = spark.readStream
          .schema("k LONG, v STRING, op STRING, ver LONG").json(in)
          .as[StreamOps.Change]
        val q = StreamOps.cdcToJdbc(src, url, "cdc_t", driver)
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(120000), "CDC query did not self-terminate")
      }
      def target(): Map[Long, (String, Long)] = spark.read.format("jdbc")
        .options(Map("url" -> url, "dbtable" -> "cdc_t", "driver" -> driver))
        .load().collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      // phase 1: update k=1, insert k=3 twice (intra-batch winner = ver 3)
      Seq(StreamOps.Change(1, "a1", "U", 2), StreamOps.Change(3, "c1", "I", 1),
          StreamOps.Change(3, "c2", "U", 3))
        .toDF().coalesce(1).write.mode("append").json(in)
      runOnce()
      assert(target() == Map(1L -> ("a1", 2L), 2L -> ("b0", 0L),
        3L -> ("c2", 3L)))
      // phase 2 lands while the query is DOWN: a stale out-of-order
      // version for k=1 (must be suppressed by checkpoint-recovered
      // state), a real update for k=2, a delete of k=3
      Seq(StreamOps.Change(1, "aSTALE", "U", 1), StreamOps.Change(2, "b1", "U", 4),
          StreamOps.Change(3, null, "D", 5))
        .toDF().coalesce(1).write.mode("append").json(in)
      runOnce() // restart from the same checkpoint
      val after = target()
      assert(after == Map(1L -> ("a1", 2L), 2L -> ("b1", 4L)),
        s"restart/late-data semantics broken: $after")
      // Y6: the synced target validates against the expected latest-wins
      // snapshot (deletes applied → deleteMissing semantics)
      val expected = Seq((1L, "a1", 2L), (2L, "b1", 4L)).toDF("k", "v", "ver")
      val back = spark.read.format("jdbc")
        .options(Map("url" -> url, "dbtable" -> "cdc_t", "driver" -> driver))
        .load().select(col("k"), col("v"), col("ver"))
      val cfg = graft.sync.SyncJob.SyncConfig(Seq("k"), Seq("v", "ver"),
        deleteMissing = true)
      assert(graft.sync.SyncJob.validate(expected, back, cfg),
        "Y6 validate failed against the streamed target")
      // Y10: the source gains a column mid-lifecycle — drift is planned
      // (ALTER DDL emitted), both sides align, and the drift-aware sync
      // validates with every row carrying the new column
      val drifted = expected.withColumn("extra", concat(col("v"), lit("!")))
      val (result, report, drift) = graft.sync.SchemaDrift.run(
        drifted, back, "cdc_t",
        graft.sync.SyncJob.SyncConfig(Seq("k"), Seq("v", "ver")))
      assert(drift.added.map(_.name) == Seq("extra"))
      assert(drift.alterDdl.exists(_.contains("extra")))
      assert(report.validated, s"drift-aware sync did not validate: $report")
      assert(result.filter(col("extra").isNull).isEmpty,
        "drifted column must reach every synced row")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("Streaming SCD2: CDC stream maintains history in Derby; restart + full redelivery idempotent") {
    // Y7 ∘ Z3 (r8): the CDC lifecycle with HISTORY — each applied change
    // closes the key's current version and opens the new one, a delete
    // closes without opening. Then the strongest replay law available
    // offline: rerun the ENTIRE changelog with a FRESH checkpoint (state
    // store empty — simulating total redelivery past the latest-wins
    // guard) and assert the history table is byte-identical, which only
    // holds if the close guard (valid_from < ver) and the (k, valid_from)
    // open-MERGE key make every statement a no-op on replay.
    val spark0 = spark
    import spark0.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_scd2").toString
      val in = s"$base/in"
      new java.io.File(in).mkdirs()
      val url = s"jdbc:derby:$base/db;create=true"
      val driver = "org.apache.derby.jdbc.EmbeddedDriver"
      Class.forName(driver)
      val conn = java.sql.DriverManager.getConnection(url)
      conn.createStatement().execute(
        "CREATE TABLE hist (k BIGINT, v VARCHAR(32), valid_from BIGINT, " +
          "valid_to BIGINT, is_current SMALLINT, PRIMARY KEY (k, valid_from))")
      conn.createStatement().execute(
        "INSERT INTO hist VALUES (1, 'a0', 0, NULL, 1)")
      conn.close()
      def runOnce(ck: String): Unit = {
        val src = spark.readStream
          .schema("k LONG, v STRING, op STRING, ver LONG").json(in)
          .as[StreamOps.Change]
        val q = StreamOps.cdcToJdbcScd2(src, url, "hist", driver)
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(120000), "SCD2 query did not self-terminate")
      }
      def hist(): Set[(Long, String, Long, Long, Int)] = spark.read.format("jdbc")
        .options(Map("url" -> url, "dbtable" -> "hist", "driver" -> driver))
        .load().collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getAs[Number](4).intValue)).toSet
      // phase 1: update k=1 (ver 2); insert+update k=3 — the intra-batch
      // latest-wins guard must apply ONLY ver 3 (one history row, not two)
      Seq(StreamOps.Change(1, "a1", "U", 2), StreamOps.Change(3, "c1", "I", 1),
          StreamOps.Change(3, "c2", "U", 3))
        .toDF().coalesce(1).write.mode("append").json(in)
      runOnce(s"$base/ck")
      assert(hist() == Set(
        (1L, "a0", 0L, 2L, 0), (1L, "a1", 2L, -1L, 1),
        (3L, "c2", 3L, -1L, 1)), s"phase-1 history wrong: ${hist()}")
      // phase 2 lands while the query is DOWN: a stale version for k=1
      // (checkpoint-recovered state must suppress it), a new key k=2,
      // a delete of k=3 (closes its history, keeps it)
      Seq(StreamOps.Change(1, "aSTALE", "U", 1), StreamOps.Change(2, "b1", "I", 4),
          StreamOps.Change(3, null, "D", 5))
        .toDF().coalesce(1).write.mode("append").json(in)
      runOnce(s"$base/ck")
      val expected = Set(
        (1L, "a0", 0L, 2L, 0), (1L, "a1", 2L, -1L, 1),
        (2L, "b1", 4L, -1L, 1),
        (3L, "c2", 3L, 5L, 0))
      assert(hist() == expected, s"phase-2 history wrong: ${hist()}")
      // full-redelivery idempotence: fresh checkpoint, every file replays
      runOnce(s"$base/ck2")
      assert(hist() == expected,
        "replaying the whole changelog changed the history — SCD2 apply is not idempotent")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("CDC MERGE idempotence law: full redelivery of the changelog is a no-op") {
    // r8 verdict item 5: the plain (non-SCD2) cdcToJdbc MERGE/DELETE
    // path replayed from scratch — fresh checkpoint, empty state store,
    // same files — must leave the target exactly as the first run did:
    // MERGE re-updates to identical values, DELETE of an absent key is
    // a no-op. This is what makes task retry + restart redelivery safe.
    val spark0 = spark
    import spark0.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_idem").toString
      val in = s"$base/in"
      new java.io.File(in).mkdirs()
      val url = s"jdbc:derby:$base/db;create=true"
      val driver = "org.apache.derby.jdbc.EmbeddedDriver"
      Class.forName(driver)
      val conn = java.sql.DriverManager.getConnection(url)
      conn.createStatement().execute(
        "CREATE TABLE t (k BIGINT PRIMARY KEY, v VARCHAR(32), ver BIGINT)")
      conn.close()
      def runOnce(ck: String): Unit = {
        val src = spark.readStream
          .schema("k LONG, v STRING, op STRING, ver LONG").json(in)
          .as[StreamOps.Change]
        val q = StreamOps.cdcToJdbc(src, url, "t", driver)
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(120000), "CDC query did not self-terminate")
      }
      def target(): Map[Long, (String, Long)] = spark.read.format("jdbc")
        .options(Map("url" -> url, "dbtable" -> "t", "driver" -> driver))
        .load().collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      Seq(StreamOps.Change(1, "a1", "I", 1), StreamOps.Change(2, "b1", "I", 2),
          StreamOps.Change(1, "a2", "U", 3), StreamOps.Change(2, null, "D", 4))
        .toDF().coalesce(1).write.mode("append").json(in)
      runOnce(s"$base/ck")
      val once = target()
      assert(once == Map(1L -> ("a2", 3L)), s"first apply wrong: $once")
      runOnce(s"$base/ck2") // full redelivery, fresh state
      assert(target() == once,
        "replaying the same changelog changed the target — MERGE path not idempotent")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("T7b transformWithState sessionize (RocksDB state store, event-time timers)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = runToSink("t7b")(
        s => StreamOps.sessionizeTws(s.toDS()).toDF(),
        Seq(
          Seq(ev(1, 0, 1, "view", 1.0), ev(2, 10, 1, "view", 2.5)),
          Seq(ev(3, 120, 2, "view", 1.0)),   // watermark 110min: closes user 1
          Seq(ev(4, 300, 2, "view", 1.0))))  // closes user 2's first session
      val u1 = rows.filter(_.getAs[Long]("user_id") == 1)
      assert(u1.length == 1)
      assert(u1.head.getAs[Int]("n_events") == 2)
      assert(u1.head.getAs[Double]("total_value") == 3.5)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("T7d transformWithState MapState and ListState: counts persist across batches, ring bounded") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = runToSink("t7d")(
        s => StreamOps.typeCountsTws(s.toDS()).toDF(),
        Seq(
          Seq(ev(1, 1, 1, "view", 0), ev(2, 2, 1, "view", 0),
            ev(3, 3, 1, "click", 0)),
          Seq(ev(4, 4, 1, "view", 0), ev(5, 5, 2, "click", 0))))
        .map(r => r.getAs[Long]("user_id") match {
          case u => (u, r.getAs[String]("event_type"),
            r.getAs[Long]("run_count"), r.getAs[String]("recent"))
        }).toSet
      // per-type counters: view counts 1,2 then 3 ACROSS the batch
      // boundary (MapState persisted); click independent; user 2 fresh
      assert(rows.contains((1L, "view", 1L, "1")))
      assert(rows.contains((1L, "view", 2L, "1,2")))
      assert(rows.contains((1L, "click", 1L, "1,2,3")))
      assert(rows.contains((1L, "view", 3L, "2,3,4")),
        s"cross-batch MapState persistence or the list ring broke: $rows")
      assert(rows.contains((2L, "click", 1L, "5")))
      assert(rows.size == 5)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("incremental dedup stream: survivors never share a band; run is deterministic") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val docs = ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)
    def run(tag: String): Map[Long, String] = {
      val dir = java.nio.file.Files.createTempDirectory(s"dedup_$tag").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.incrementalDedup(
          src.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/verdicts")
        .option("checkpointLocation", s"$dir/ck").start()
      try {
        src.addData(b1.toSeq: _*); q.processAllAvailable()
        src.addData(b2.toSeq: _*); q.processAllAvailable()
      } finally q.stop()
      val rows = spark.read.parquet(s"$dir/verdicts").collect()
      // pin BEFORE collapsing to a map: a duplicated batch write would
      // survive .toMap and fake a clean size
      assert(rows.length == docs.length,
        s"${rows.length} verdict rows for ${docs.length} docs")
      rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    }
    val v1 = run("a")
    assert(v1.size == docs.length, "some doc got no (or several) verdicts")
    Seq("keep", "dup_index", "dup_batch").foreach(c =>
      assert(v1.values.exists(_ == c), s"verdict class $c never produced"))
    // THE invariant batching cannot break: the survivor set is
    // band-independent — no two kept docs share any LSH band hash.
    val kept = v1.filter(_._2 == "keep").keys.toSeq.toDF("doc_id")
    val keptBands = ops.LlmPipeline.minhashBands(spark, sfDir)
      .join(kept, Seq("doc_id"), "left_semi").persist()
    val clash = keptBands.as("a").join(keptBands.as("b"),
      $"a.band" === $"b.band" && $"a.band_hash" === $"b.band_hash" &&
        $"a.doc_id" < $"b.doc_id").count()
    keptBands.unpersist()
    assert(clash == 0, s"$clash surviving pairs share a band")
    // determinism: an identical second run produces identical verdicts
    assert(run("b") == v1, "re-run diverged — the sink is order-dependent")
  }

  test("band-index compaction: probe set invariant, files coalesced") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dedup_c").toString
    val docs = ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1).take(90)
    val src = MemoryStream[(Long, String)]
    val q = StreamOps.incrementalDedup(
        src.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/verdicts")
      .option("checkpointLocation", s"$dir/ck").start()
    try {
      docs.grouped(30).foreach { b =>
        src.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val before = spark.read.parquet(s"$dir/index")
      .select("band", "band_hash").distinct().collect().toSet
    val filesBefore = new java.io.File(s"$dir/index")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val n = StreamOps.compactBandIndex(spark, s"$dir/index")
    val after = spark.read.parquet(s"$dir/index")
    assert(after.select("band", "band_hash").distinct().collect().toSet ==
      before, "compaction changed the probe set")
    assert(n == after.count(), "reported count diverges from the rewrite")
    val filesAfter = new java.io.File(s"$dir/index")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesAfter <= math.max(1, filesBefore / 2),
      s"compaction left $filesAfter of $filesBefore files")
  }

  test("Y38b streaming: a CDC stream lands in the lake via foreachBatch + cowApplyChanges, one published version per micro-batch") {
    // the production CDC-into-lake wiring end-to-end: each micro-batch
    // of change rows applies through the copy-on-write path and
    // publishes atomically — a reader between any two micro-batches
    // sees a complete version, never a half-applied batch. Sequential
    // versions make cross-batch latest-wins equal to the sequential
    // apply, so the final lake must equal the one-shot apply of the
    // whole log.
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val sf0 = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft_y38bs")
      .toString + "/lake"
    val proj = graft.ops.Tables.orders(spark, sf0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    assert(graft.ops.Sync.publish(spark,
      proj.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty))
    graft.ops.Sync.writeFileStats(spark, s"$root/v1", "o_orderkey")
    val two = proj.orderBy("o_orderkey").limit(2).collect()
    val (k1, c1, p1) = (two(0).getLong(0), two(0).getLong(1), two(0).getDouble(2))
    val (k2, c2, p2) = (two(1).getLong(0), two(1).getLong(1), two(1).getDouble(2))
    val kNew = proj.agg(max(col("o_orderkey"))).collect()(0).getLong(0) + 5000
    val src = MemoryStream[Chg]
    var ver = 1
    val q = src.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val rep = graft.ops.Sync.cowApplyChanges(spark, root, ver,
            ver + 1, "o_orderkey", batch)
          assert(rep.published); ver += 1
        }
      }.start()
    try {
      Seq(
        Seq(Chg(k1, c1, p1 + 10, "U", 1), Chg(kNew, 111, 5.0, "I", 2)),
        Seq(Chg(k1, c1, p1, "D", 3), Chg(k2, c2, p2 + 20, "U", 4)),
        Seq(Chg(kNew, 111, 7.5, "U", 5))
      ).foreach { b => src.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(ver == 4, s"expected 3 published versions, got ${ver - 1}")
    val (vName, lake) = graft.ops.Sync.readPublished(spark, root)
    assert(vName == "v4")
    val expected = proj
      .filter(col("o_orderkey") =!= k1 && col("o_orderkey") =!= k2)
      .unionByName(Seq((k2, c2, p2 + 20), (kNew, 111L, 7.5))
        .toDF("o_orderkey", "o_custkey", "o_totalprice"))
    assert(lake.exceptAll(expected).isEmpty &&
      expected.exceptAll(lake).isEmpty,
      "streamed CDC apply diverged from the sequential batch apply")
    // intermediate versions stayed live (rollback/time-travel intact):
    // v2 reflects exactly micro-batch 1's apply
    val v2 = spark.read.parquet(s"$root/v2")
    assert(v2.filter(col("o_orderkey") === k1)
      .collect()(0).getDouble(2) == p1 + 10)
    assert(v2.filter(col("o_orderkey") === kNew).count() == 1)
  }

  test("Y38c exactly-once lake sink: batchId-keyed versions make replays no-ops, heal a torn pointer, chain across gaps") {
    // The hand-rolled foreachBatch above double-applies on a retry (its
    // version counter is driver state); StreamOps.cdcIntoLake is the
    // production form — target version = baseVersion + batchId + 1, so
    // every foreachBatch replay lands on a version that already exists
    // and SKIPS. The three crash windows are each exercised directly
    // against the kernel: committed replay, rename-vs-swap tear
    // (pointer heal), and pre-rename orphan (covered by the staging
    // clobber inside cowApplyChanges, asserted via the gap-chain apply).
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val sf0 = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft_y38c").toString
    val root = s"$base/lake"
    val proj = graft.ops.Tables.orders(spark, sf0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    assert(graft.ops.Sync.publish(spark,
      proj.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty))
    graft.ops.Sync.writeFileStats(spark, s"$root/v1", "o_orderkey")
    val two = proj.orderBy("o_orderkey").limit(2).collect()
    val (k1, c1, p1) = (two(0).getLong(0), two(0).getLong(1), two(0).getDouble(2))
    val (k2, c2, p2) = (two(1).getLong(0), two(1).getLong(1), two(1).getDouble(2))
    val kNew = proj.agg(max(col("o_orderkey"))).collect()(0).getLong(0) + 5000
    val src = MemoryStream[Chg]
    val q = StreamOps.cdcIntoLake(src.toDF(), root, "o_orderkey", 1)
      .option("checkpointLocation", s"$base/ck").start()
    val b1 = Seq(Chg(k1, c1, p1 + 10, "U", 1), Chg(kNew, 111, 5.0, "I", 2))
    val b2 = Seq(Chg(k1, c1, p1, "D", 3))
    try {
      Seq(b1, b2).foreach { b => src.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def pointer() = graft.ops.Sync.readPublished(spark, root)._1
    def snap(): (Long, Double) = {
      val r = graft.ops.Sync.readPublished(spark, root)._2
        .agg(count(lit(1)), graft.ops.Det.dsum(col("o_totalprice")))
        .collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    assert(pointer() == "v3", s"expected v3 live, got ${pointer()}")
    val committed = snap()
    val lake = graft.ops.Sync.readPublished(spark, root)._2
    assert(lake.filter(col("o_orderkey") === k1).isEmpty,
      "batch-2 delete of k1 did not apply")
    assert(lake.filter(col("o_orderkey") === kNew).count() == 1)
    // committed-replay law: re-delivering batch 1 (target v3 exists)
    // must skip without touching data or pointer
    val b2df = b2.toDF()
    assert(!StreamOps.applyCdcBatch(spark, root, "o_orderkey", 1, b2df, 1))
    assert(pointer() == "v3" && snap() == committed,
      "a replayed committed batch changed the lake")
    // torn-pointer heal: crash landed the v3 rename but not the swap —
    // simulate by pointing back at v2; the replay must heal to v3
    graft.ops.Sync.repoint(spark, root, 2)
    assert(!StreamOps.applyCdcBatch(spark, root, "o_orderkey", 1, b2df, 1))
    assert(pointer() == "v3" && snap() == committed,
      "replay did not heal the torn pointer")
    // empty batch: no version churn, no pointer movement
    assert(!StreamOps.applyCdcBatch(spark, root, "o_orderkey", 1,
      b2df.limit(0), 2))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/v4")) &&
      pointer() == "v3", "an empty batch published a version")
    // gap-chain: batch 3 applies FROM v3 (the newest below its target
    // v5), not from the nonexistent v4; content reflects the update
    val b4 = Seq(Chg(k2, c2, p2 + 20, "U", 4)).toDF()
    assert(StreamOps.applyCdcBatch(spark, root, "o_orderkey", 1, b4, 3))
    assert(pointer() == "v5" &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$root/v4")))
    val after = graft.ops.Sync.readPublished(spark, root)._2
    assert(after.filter(col("o_orderkey") === k2)
      .collect()(0).getDouble(2) == p2 + 20,
      "gap-chained batch lost the running state")
    assert(after.count() == committed._1,
      "gap-chained update changed the row count")
  }

  test("Z1-streaming fuzz: generated watermarked window/dedup queries agree with their batch twins") {
    // The batch≡streaming law (the hand-built W7 case above) generalized
    // to GENERATED shapes: 12 seeded configs over {tumbling, sliding,
    // session, dedup} × group keys × filters × watermark delays, each
    // run through MemoryStream AND as a plain batch query, results
    // compared as multisets. Two feed regimes, each making the batch
    // twin exact by construction: ORDERED feeds (ts-sorted batches —
    // nothing is ever late, any delay works) and SHUFFLED feeds with
    // delay ≥ the corpus span (arrival-order invariance: the stream
    // must converge to the batch answer no matter how rows arrive).
    // Flush sentinels sit at maxTs + delay + 1 day so the watermark
    // provably passes every real window's end and append mode emits
    // them all; sentinel-born rows are excluded by their window start
    // (> maxTs) or negative event_id.
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    val evs = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val minTs = evs.map(_.ts.getTime).min
    val maxTs = evs.map(_.ts.getTime).max
    val spanMin = (maxTs - minTs) / 60000L + 60L
    val day = 86400000L
    val rnd = new scala.util.Random(20260814L)
    val kinds = Seq("tumble", "slide", "session", "dedup")
    for (i <- 0 until 12) {
      val kind = kinds(i % 4)
      val ordered = rnd.nextBoolean()
      val dur = Seq(10, 30, 60, 120)(rnd.nextInt(4))
      val slide = Seq(5, 10, 15)(rnd.nextInt(3))
      val delayMin = if (ordered) Seq(5L, 15L, 60L)(rnd.nextInt(3))
                     else spanMin
      val keys0 = Seq(Seq("user_id"), Seq("event_type"),
        Seq("user_id", "event_type"), Seq.empty[String])(rnd.nextInt(4))
      // Spark rejects GLOBAL session-window aggregation on streams
      // ("Global aggregation with session window ... not supported") —
      // sessions need a partition key there, so give the session kind one
      val keys = if (kind == "session" && keys0.isEmpty) Seq("user_id")
                 else keys0
      val filt = rnd.nextInt(3) match {
        case 0 => None
        case 1 => Some(col("event_type") === "view")
        case _ => Some(col("value") > 0.5)
      }
      val label = s"[seed=$i kind=$kind ordered=$ordered dur=$dur " +
        s"slide=$slide delay=$delayMin keys=${keys.mkString(",")} " +
        s"filt=${filt.isDefined}]"
      def build(df: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        val f = filt.map(df.filter).getOrElse(df)
        val wm = f.withWatermark("ts", s"$delayMin minutes")
        if (kind == "dedup") wm.dropDuplicates("event_id")
        else {
          val w = kind match {
            case "tumble" => window(col("ts"), s"$dur minutes")
            case "slide"  => window(col("ts"), s"$dur minutes",
              s"$slide minutes")
            case _        => session_window(col("ts"), s"$dur minutes")
          }
          wm.groupBy(w.as("w") +: keys.map(col): _*)
            .agg(count(lit(1)).as("n"), sum("value").as("sv"),
              min("event_id").as("mi"), max("event_id").as("ma"))
            .select(col("w.start").as("ws") +: keys.map(col) ++:
              Seq(col("n"), col("sv"), col("mi"), col("ma")): _*)
        }
      }
      val base0 = if (ordered) evs.sortBy(e => (e.ts.getTime, e.event_id))
                  else rnd.shuffle(evs)
      // dedup feeds replay every 7th event — the stream must emit it once
      val feed0 =
        if (kind == "dedup") base0 ++ base0.filter(_.event_id % 7 == 0)
        else base0
      val feed = if (ordered) feed0.sortBy(e => (e.ts.getTime, e.event_id))
                 else feed0
      val s1 = maxTs + delayMin * 60000L + day
      val batches = feed.grouped((feed.length + 2) / 3).toSeq ++ Seq(
        Seq(Event(-1L, new Timestamp(s1), -1L, "view", 1.0)),
        Seq(Event(-2L, new Timestamp(s1 + day), -1L, "view", 1.0)))
      val streamed = runToSink(s"fzs$i")(s => build(s.toDF()), batches)
      val batchRows = build(evs.toDF()).collect()
      if (kind == "dedup") {
        val sIds = streamed.map(_.getAs[Long]("event_id"))
          .filter(_ >= 0).sorted.toSeq
        val bIds = batchRows.map(_.getAs[Long]("event_id")).sorted.toSeq
        assert(sIds == bIds,
          s"$label dedup diverged: ${sIds.length} vs ${bIds.length} rows")
      } else {
        def toMapOf(rows: Array[org.apache.spark.sql.Row]) = rows
          .filter(_.getAs[Timestamp]("ws").getTime <= maxTs)
          .map { r =>
            val k = r.getAs[Timestamp]("ws").getTime ->
              keys.map(c => String.valueOf(r.get(r.fieldIndex(c))))
                .mkString("|")
            k -> ((r.getAs[Long]("n"), r.getAs[Double]("sv"),
              r.getAs[Long]("mi"), r.getAs[Long]("ma")))
          }.toMap
        val sm = toMapOf(streamed)
        val bm = toMapOf(batchRows)
        assert(sm.keySet == bm.keySet,
          s"$label group sets diverge: only-stream=" +
            s"${(sm.keySet -- bm.keySet).take(3)} only-batch=" +
            s"${(bm.keySet -- sm.keySet).take(3)}")
        for ((k, (bn, bv, bmi, bma)) <- bm) {
          val (sn, sv, smi, sma) = sm(k)
          assert(sn == bn && smi == bmi && sma == bma,
            s"$label $k: ($sn,$smi,$sma) vs ($bn,$bmi,$bma)")
          assert(math.abs(sv - bv) < 1e-6, s"$label $k: sum $sv vs $bv")
        }
      }
    }
  }
}
