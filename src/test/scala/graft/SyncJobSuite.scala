package graft

import graft.ops.{Sync, Tables}
import graft.sync.SyncJob
import graft.sync.SyncJob.SyncConfig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Utility-level lifecycle (SURVEY §3.1): diff → apply → validate composed
  * by SyncJob, checked against independently-derivable expectations from
  * the deterministic sourceView mutation (drop %10, mutate %7, insert %13).
  */
class SyncJobSuite extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private val cfg = SyncConfig(
    keyCols = Seq("o_orderkey"),
    compareCols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority"))

  test("incremental run: report matches the sourceView mutation law") {
    val target = Tables.orders(spark, sf)
    val source = Sync.sourceView(spark, sf)
    val (result, r) = SyncJob.run(source, target, cfg)

    val n = target.count()
    val nDropped = target.filter(col("o_orderkey") % 10 === 0).count()
    val nInserted = target.filter(col("o_orderkey") % 13 === 0).count()
    // mutated rows: %7, still present in source (not %10-dropped)
    val nMutated = target
      .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 10 =!= 0)
      // mutation is a no-op for rows already 'F' with... always changes
      // o_totalprice (+1000), so every such row is an update
      .count()

    assert(r.nInsert == nInserted)
    assert(r.nUpdate == nMutated)
    assert(r.nDelete == nDropped)
    assert(r.nSame == n - nDropped - nMutated)
    // incremental: target-only rows survive
    assert(r.resultRows == source.count() + nDropped)
    assert(r.validated)
    // applied rows equal source rows on every mutated key
    val mism = result.as("r").join(source.as("s"), Seq("o_orderkey"))
      .filter(col("r.o_totalprice") =!= col("s.o_totalprice")).count()
    assert(mism == 0)
  }

  test("full run (deleteMissing): result is exactly the source") {
    val target = Tables.orders(spark, sf)
    val source = Sync.sourceView(spark, sf)
    val (result, r) = SyncJob.run(source, target, cfg.copy(deleteMissing = true))
    assert(r.resultRows == source.count())
    assert(r.validated)
    assert(result.exceptAll(source).isEmpty && source.exceptAll(result).isEmpty)
  }

  test("column-subset apply: excluded-column churn ships nothing") {
    val cmp = Seq("o_orderstatus", "o_totalprice", "o_orderpriority")
    val subsetCfg = SyncConfig(Seq("o_orderkey"), cmp)
    val tgt = Tables.orders(spark, sf).select(
      (Seq(col("o_orderkey")) ++ cmp.map(col)) :+
        concat(lit("t-"), col("o_orderkey")).as("sync_note"): _*)
    // source #1: IDENTICAL compared subset, every row churning in the
    // excluded audit column — the law: nothing ships, target unchanged
    val srcAuditOnly = tgt.withColumn("sync_note",
      concat(lit("s-"), col("o_orderkey")))
    val quiet = SyncJob.applySubset(srcAuditOnly, tgt, subsetCfg)
    assert(quiet.filter(col("op").isin("I", "U")).count() == 0L,
      "audit-only churn must classify every row S")
    assert(quiet.drop("op").exceptAll(tgt).isEmpty &&
           tgt.exceptAll(quiet.drop("op")).isEmpty,
      "audit-only churn must leave the target bit-identical")
    // source #2: real payload drift on top of all-rows audit churn —
    // U rows take source compare values but KEEP the target audit value
    val src = Sync.sourceView(spark, sf).select(
      (Seq(col("o_orderkey")) ++ cmp.map(col)) :+
        concat(lit("s-"), col("o_orderkey")).as("sync_note"): _*)
    val out = SyncJob.applySubset(src, tgt, subsetCfg)
    assert(out.filter(col("op") === "U").count() > 0L)
    assert(out.filter(col("op") =!= "I" &&
        !col("sync_note").startsWith("t-")).count() == 0L,
      "a shipped row overwrote the target-owned column")
    assert(out.filter(col("op") === "I" && col("sync_note").isNotNull)
      .count() == 0L, "an insert fabricated a target-owned value")
    // U rows really carry the source payload
    val stale = out.filter(col("op") === "U").as("r")
      .join(src.as("s"), Seq("o_orderkey"))
      .filter(col("r.o_totalprice") =!= col("s.o_totalprice")).count()
    assert(stale == 0L, "a U row kept the stale compare payload")
  }

  test("lifecycle over JDBC endpoints: Derby target catches up to the source") {
    import graft.sources.JdbcSync._
    import org.apache.spark.sql.SaveMode
    val dbPath = java.nio.file.Files.createTempDirectory("graft_syncjob").resolve("db")
    val jcfg = JdbcConfig(url = s"jdbc:derby:$dbPath;create=true",
      table = "ORDERS_TGT", driver = "org.apache.derby.jdbc.EmbeddedDriver")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority")
    // target DB starts as the stale snapshot; source is the mutated view
    writeTable(Tables.orders(spark, sf).select(cols.map(col): _*),
      jcfg, SaveMode.Overwrite)
    val source = Sync.sourceView(spark, sf).select(cols.map(col): _*)
    val target = readTable(spark, jcfg, None)
    val c = SyncConfig(Seq("o_orderkey"), cols.tail, deleteMissing = true)
    val (result, r) = SyncJob.run(source, target, c)
    assert(r.validated && r.nUpdate > 0 && r.nInsert > 0 && r.nDelete > 0)
    // write the applied state back over JDBC and re-diff: fully in sync
    writeTable(result, jcfg, SaveMode.Overwrite)
    val refreshed = readTable(spark, jcfg, None)
    val post = SyncJob.diff(source, refreshed, c)
    assert(post.filter(col("op") =!= "S").isEmpty)
  }

  test("schema drift mid-sync: gained + lost columns align, DDL generated") {
    import graft.sync.SchemaDrift
    import org.apache.spark.sql.types._
    // target = stale snapshot that still has o_comment-like extra column;
    // source = mutated view that gained a sync_ts column and lost o_clerk
    val target = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .withColumn("o_clerk", concat(lit("Clerk#"), col("o_custkey")))
    val source = Sync.sourceView(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .withColumn("sync_ts", lit("2026-08-13").cast("timestamp"))

    val (result, report, drift) = SchemaDrift.run(
      source, target, "dbo.orders_tgt", cfg.copy(deleteMissing = true))

    assert(drift.added.map(_.name) == Seq("sync_ts"))
    assert(drift.removed.map(_.name) == Seq("o_clerk"))
    assert(drift.alterDdl ==
      Seq("ALTER TABLE [dbo].[orders_tgt] ADD [sync_ts] DATETIME2(6) NULL"))
    // full sync: result is exactly the aligned source — every row carries
    // the gained column, the lost column is nulled
    assert(report.validated)
    assert(report.nSame == 0, "every surviving row drifted via sync_ts")
    assert(result.columns.toSet ==
      Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "sync_ts", "o_clerk"))
    assert(result.filter(col("sync_ts").isNull).count() == 0)
    assert(result.filter(col("o_clerk").isNotNull).count() == 0)
    assert(result.count() == source.count())

    // incremental drift run: target-only rows survive with null sync_ts
    // and their o_clerk intact
    val (res2, rep2, _) = SchemaDrift.run(
      source, target, "dbo.orders_tgt", cfg)
    assert(rep2.validated)
    val leftovers = res2.join(source, Seq("o_orderkey"), "left_anti")
    assert(leftovers.count() == rep2.nDelete && rep2.nDelete > 0)
    assert(leftovers.filter(col("sync_ts").isNotNull).count() == 0)
    assert(leftovers.filter(col("o_clerk").isNull).count() == 0)
  }

  test("schema drift: case-only name divergence is not drift") {
    import graft.sync.SchemaDrift
    // the JDBC-uppercase scenario rowDigest documents as supported: an
    // unquoted-DDL target surfacing O_CUSTKEY is the SAME column as the
    // parquet source's o_custkey — classifying it added+removed would
    // null-overwrite the real data through align()'s case-insensitive
    // withColumn
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val target = base.withColumnRenamed("o_custkey", "O_CUSTKEY")
    val drift = SchemaDrift.plan(base, target, "dbo.t", Seq("o_orderkey"))
    assert(drift.added.isEmpty && drift.removed.isEmpty && drift.alterDdl.isEmpty)
    // and a case-divergent KEY passes the existence check too
    val drift2 = SchemaDrift.plan(base, target
      .withColumnRenamed("o_orderkey", "O_ORDERKEY"), "dbo.t", Seq("o_orderkey"))
    assert(drift2.added.isEmpty && drift2.removed.isEmpty)
  }

  test("schema drift: TYPE drift on a name-matched column refuses loudly") {
    import graft.sync.SchemaDrift
    // an INT→BIGINT widening at the source is neither added nor removed —
    // plan() must not classify it as no-drift (the digest/unionByName
    // would coerce lossily or fail deep in the plan); it needs an explicit
    // ALTER COLUMN migration, so the plan step raises with the column name
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val widened = base.withColumn("o_custkey", col("o_custkey").cast("int"))
    val e = intercept[IllegalArgumentException] {
      SchemaDrift.plan(widened, base, "dbo.t", Seq("o_orderkey"))
    }
    assert(e.getMessage.contains("o_custkey"))
    assert(e.getMessage.toLowerCase.contains("type drift"))
  }

  test("Y27 Migration: safety matrix, phase ordering, PK refusal, idempotence") {
    import graft.sync.Migration
    import org.apache.spark.sql.types._
    // safety matrix spot-checks — one per rule class, both directions
    def s(f: DataType, t: DataType) = Migration.changeSafety(f, t)
    assert(s(IntegerType, LongType) == "safe")
    assert(s(LongType, IntegerType) == "lossy")
    assert(s(FloatType, DoubleType) == "safe")
    assert(s(DoubleType, FloatType) == "lossy")
    assert(s(LongType, DecimalType(19, 0)) == "safe")  // 19 digits hold a long
    assert(s(LongType, DecimalType(18, 0)) == "lossy") // 18 do not
    assert(s(DecimalType(10, 2), DecimalType(12, 2)) == "safe")
    assert(s(DecimalType(12, 2), DecimalType(12, 4)) == "lossy") // int part shrinks
    assert(s(DateType, TimestampType) == "safe")
    assert(s(TimestampType, DateType) == "lossy")
    assert(s(LongType, StringType) == "safe")
    assert(s(StringType, LongType) == "incompatible")   // a parse, not a cast
    assert(s(TimestampType, LongType) == "incompatible") // an encoding choice
    assert(s(BinaryType, StringType) == "incompatible")  // a charset guess
    // phase ordering: adds strictly before alters strictly before drops
    val cur = StructType(Seq(
      StructField("pk", LongType), StructField("a", IntegerType),
      StructField("gone", StringType)))
    val des = StructType(Seq(
      StructField("pk", LongType), StructField("a", LongType),
      StructField("fresh", StringType)))
    val plan = Migration.plan(cur, des, "dbo.t", Seq("pk"))
    assert(plan.map(_.action) == Seq("add", "alter", "drop"),
      s"expand→migrate→contract order broke: $plan")
    assert(plan.map(_.step_order) == plan.map(_.step_order).sorted)
    // manual steps carry no DDL; every other step carries exactly one
    assert(plan.forall(st => (st.action == "manual") == st.ddl.isEmpty))
    // idempotence: desired ≡ current plans nothing
    assert(Migration.plan(des, des, "dbo.t", Seq("pk")).isEmpty)
    // PK type change refuses loudly — a key migration is a rebuild
    val desBadKey = StructType(des.fields.map(f =>
      if (f.name == "pk") f.copy(dataType = IntegerType) else f))
    val e = intercept[IllegalArgumentException] {
      Migration.plan(cur, desBadKey, "dbo.t", Seq("pk"))
    }
    assert(e.getMessage.contains("pk") &&
      e.getMessage.toLowerCase.contains("rebuild"))
    // injection discipline: a hostile column name stays inside brackets
    val hostile = StructType(Seq(StructField("pk", LongType),
      StructField("x] DROP TABLE t --", StringType)))
    val hp = Migration.plan(StructType(Seq(StructField("pk", LongType))),
      hostile, "dbo.t", Seq("pk"))
    assert(hp.head.ddl.get.contains("[x]] DROP TABLE t --]"),
      s"identifier escape failed: ${hp.head.ddl}")
  }

  test("composite-key diff classifies on the full key") {
    val spark0 = spark
    import spark0.implicits._
    val t = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c"))
      .toDF("k1", "k2", "v")
    val s = Seq((1L, 1L, "a"), (1L, 2L, "B"), (3L, 1L, "d"))
      .toDF("k1", "k2", "v")
    val c = SyncConfig(Seq("k1", "k2"), Seq("v"))
    val ops = SyncJob.diff(s, t, c)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(ops((1L, 1L)) == "S")
    assert(ops((1L, 2L)) == "U")
    assert(ops((2L, 1L)) == "D")
    assert(ops((3L, 1L)) == "I")
  }

  test("Y1 TypeMapping: INFORMATION_SCHEMA rows plan the Spark schema") {
    import graft.sync.TypeMapping._
    import org.apache.spark.sql.types._
    // a representative MS-SQL catalog slice, as the planner would read it
    val meta = Seq(
      ColumnMeta("id", "bigint", nullable = false),
      ColumnMeta("qty", "int"),
      ColumnMeta("flag", "bit"),
      ColumnMeta("price", "decimal", precision = Some(12), scale = Some(2)),
      ColumnMeta("amount", "money"),
      ColumnMeta("ratio", "float"),
      ColumnMeta("name", "nvarchar", charLength = Some(-1)),
      ColumnMeta("guid", "uniqueidentifier"),
      ColumnMeta("created", "datetime2", precision = Some(7)),
      ColumnMeta("offset_ts", "datetimeoffset"),
      ColumnMeta("age", "tinyint"),
      ColumnMeta("payload", "varbinary", charLength = Some(-1)))
    val st = toStructType(meta)
    assert(st("id") == StructField("id", LongType, nullable = false))
    assert(st("price").dataType == DecimalType(12, 2))
    assert(st("amount").dataType == DecimalType(19, 4)) // money is exact
    assert(st("ratio").dataType == DoubleType)          // float(53)
    assert(st("name").dataType == StringType)
    assert(st("created").dataType == TimestampType)
    assert(st("offset_ts").dataType == StringType)      // lossless offset
    assert(st("age").dataType == ShortType)             // tinyint unsigned
    assert(st("payload").dataType == BinaryType)
    intercept[IllegalArgumentException](
      toSparkType(ColumnMeta("x", "geography")))
  }

  test("Y1 TypeMapping: DDL generation + round-trip stability law") {
    import graft.sync.TypeMapping._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_totalprice", DoubleType),
      StructField("o_comment", StringType),
      StructField("o_orderdate", TimestampType),
      StructField("o_flag", BooleanType),
      StructField("o_tax", DecimalType(12, 2))))
    val ddl = createTableDdl("dbo.orders_sync", schema, Seq("o_orderkey"))
    assert(ddl.startsWith("CREATE TABLE [dbo].[orders_sync]")) // per-part quoting
    assert(ddl.contains("[o_orderkey] BIGINT NOT NULL"))
    assert(ddl.contains("[o_totalprice] FLOAT NULL"))
    assert(ddl.contains("[o_comment] NVARCHAR(MAX) NULL"))
    assert(ddl.contains("[o_orderdate] DATETIME2(6) NULL"))
    assert(ddl.contains("[o_tax] DECIMAL(12,2) NULL"))
    assert(ddl.contains("PRIMARY KEY ([o_orderkey])"))
    // hostile identifier cannot break out of the bracket quoting
    val evil = createTableDdl("t]; DROP TABLE x--",
      StructType(Seq(StructField("a] BIGINT); --", IntegerType))))
    assert(evil.contains("[t]]; DROP TABLE x--]"))
    assert(evil.contains("[a]] BIGINT); --]"))
    // push to T-SQL, read the catalog back: unchanged (this schema has
    // no documented widenings)
    assert(roundTrip(schema) == schema)
    // documented widenings: Byte -> Short survives a second trip fixed
    val bytey = StructType(Seq(StructField("b", ByteType)))
    val once = roundTrip(bytey)
    assert(once("b").dataType == ShortType)
    assert(roundTrip(once) == once) // idempotent from the first trip on
  }

  test("Y1: TypeMapping agrees with Spark's built-in MsSqlServerDialect (offline T-SQL parity)") {
    // No MS-SQL server exists in this environment, but Spark SHIPS the
    // SQL Server dialect — so the planning-path mapping (catalog text,
    // TypeMapping) is testable offline against the runtime-path mapping
    // (JDBC metadata, MsSqlServerDialect) Spark would use on a real
    // server. Where the dialect states an opinion, the two paths must
    // agree, or a first-time sync would plan one schema and read another.
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    import graft.sync.TypeMapping.{toSparkType, toSqlServerType, ColumnMeta}
    val dialect = JdbcDialects.get("jdbc:sqlserver://host;databaseName=db")
    assert(dialect.getClass.getSimpleName.contains("MsSqlServer"),
      s"dialect lookup failed: ${dialect.getClass}")
    // write direction: Spark type → T-SQL DDL type
    for ((dt, ours) <- Seq(
        StringType -> "NVARCHAR(MAX)", BooleanType -> "BIT",
        BinaryType -> "VARBINARY(MAX)", ShortType -> "SMALLINT",
        ByteType -> "SMALLINT", DoubleType -> "FLOAT", FloatType -> "REAL")) {
      assert(toSqlServerType(dt) == ours)
      dialect.getJDBCType(dt).foreach { j =>
        assert(j.databaseTypeDefinition.toUpperCase == ours,
          s"$dt: TypeMapping says $ours, dialect says ${j.databaseTypeDefinition}")
      }
    }
    // documented divergence: we emit DATETIME2(6) (µs — exactly Spark's
    // timestamp precision); the dialect's legacy choice loses precision
    assert(toSqlServerType(TimestampType) == "DATETIME2(6)")
    // read direction: JDBC metadata → Catalyst type, vs our catalog-text
    // path, for every type the dialect overrides
    val md = new org.apache.spark.sql.types.MetadataBuilder
    def cat(sqlType: Int, name: String) =
      dialect.getCatalystType(sqlType, name, 0, md)
    for ((code, name) <- Seq(
        java.sql.Types.SMALLINT -> "smallint",
        java.sql.Types.TINYINT -> "tinyint",
        java.sql.Types.REAL -> "real")) {
      cat(code, name).foreach { dialectType =>
        assert(dialectType == toSparkType(ColumnMeta("c", name)),
          s"$name: dialect reads $dialectType, TypeMapping plans " +
            s"${toSparkType(ColumnMeta("c", name))}")
      }
    }
    // datetimeoffset: a pinned DIVERGENCE. The dialect's default reads
    // it as TimestampType, which UTC-normalizes and silently drops the
    // stored offset — Spark ships
    // spark.sql.legacy.mssqlserver.datetimeoffsetMapping.enabled to get
    // the lossless string form back. Our planning path defaults to that
    // lossless StringType (TypeMapping scaladoc); assert both choices so
    // a change in either engine or mapping surfaces here.
    assert(cat(microsoft(), "datetimeoffset").contains(TimestampType),
      "dialect default changed — revisit the documented divergence")
    assert(toSparkType(ColumnMeta("c", "datetimeoffset")) == StringType)
  }

  // microsoft.sql.Types.DATETIMEOFFSET = -155 (the driver constant; the
  // jar is absent offline, so the code is inlined)
  private def microsoft(): Int = -155

  test("MergeSql: T-SQL rendering pinned offline, Derby rendering binds twice") {
    import graft.sync.MergeSql
    // the production target is MS-SQL-shaped but unreachable offline —
    // pin the exact statement text the sink would send, the TypeMapping
    // DDL-parity idiom applied to DML
    val t = MergeSql.upsert(MergeSql.TSql, "dbo.kv", "k", Seq("v", "ver"))
    assert(t.sql ==
      "MERGE INTO dbo.kv WITH (HOLDLOCK) AS t USING (VALUES (?, ?, ?)) AS s (k, v, ver) " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v, ver = s.ver " +
        "WHEN NOT MATCHED THEN INSERT (k, v, ver) VALUES (s.k, s.v, s.ver);")
    assert(t.bindOrder == Seq("k", "v", "ver"),
      "T-SQL binds the row once into the VALUES source constructor")
    val d = MergeSql.upsert(MergeSql.Derby, "kv", "k", Seq("v", "ver"))
    assert(d.sql ==
      "MERGE INTO kv t USING SYSIBM.SYSDUMMY1 ON t.k = ? " +
        "WHEN MATCHED THEN UPDATE SET v = ?, ver = ? " +
        "WHEN NOT MATCHED THEN INSERT (k, v, ver) VALUES (?, ?, ?)")
    assert(d.bindOrder == Seq("k", "v", "ver", "k", "v", "ver"),
      "Derby repeats every column across the UPDATE and INSERT branches")
    assert(MergeSql.delete(MergeSql.TSql, "dbo.kv", "k").sql ==
      "DELETE FROM dbo.kv WHERE k = ?")
    intercept[IllegalArgumentException] {
      MergeSql.upsert(MergeSql.TSql, "kv; DROP TABLE x", "k", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      MergeSql.upsert(MergeSql.Derby, "kv", "k", Seq("v FROM x--"))
    }
  }

  test("MergeSql SCD2: close/open renderings pinned offline, both dialects") {
    import graft.sync.MergeSql
    // close is dialect-shared; the valid_from < ? guard is the replay
    // idempotence mechanism — pin it so a refactor can't drop it
    val c = MergeSql.scd2Close(MergeSql.TSql, "dbo.hist", "k")
    assert(c.sql ==
      "UPDATE dbo.hist SET valid_to = ?, is_current = 0 " +
        "WHERE k = ? AND is_current = 1 AND valid_from < ?")
    assert(c.bindOrder == Seq("ver", "k", "ver"))
    assert(MergeSql.scd2Close(MergeSql.Derby, "hist", "k").sql ==
      "UPDATE hist SET valid_to = ?, is_current = 0 " +
        "WHERE k = ? AND is_current = 1 AND valid_from < ?")
    // open MERGEs on (k, valid_from) so replay re-updates, not duplicates
    val t = MergeSql.scd2Open(MergeSql.TSql, "dbo.hist", "k", "v")
    assert(t.sql ==
      "MERGE INTO dbo.hist WITH (HOLDLOCK) AS t " +
        "USING (VALUES (?, ?, ?)) AS s (k, v, valid_from) " +
        "ON t.k = s.k AND t.valid_from = s.valid_from " +
        "WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT (k, v, valid_from, valid_to, is_current) " +
        "VALUES (s.k, s.v, s.valid_from, NULL, 1);")
    assert(t.bindOrder == Seq("k", "v", "ver"))
    val d = MergeSql.scd2Open(MergeSql.Derby, "hist", "k", "v")
    assert(d.sql ==
      "MERGE INTO hist t USING SYSIBM.SYSDUMMY1 " +
        "ON t.k = ? AND t.valid_from = ? " +
        "WHEN MATCHED THEN UPDATE SET v = ? " +
        "WHEN NOT MATCHED THEN INSERT (k, v, valid_from, valid_to, is_current) " +
        "VALUES (?, ?, ?, CAST(NULL AS BIGINT), 1)")
    assert(d.bindOrder == Seq("k", "ver", "v", "k", "v", "ver"))
    intercept[IllegalArgumentException] {
      MergeSql.scd2Open(MergeSql.TSql, "hist", "k", "v; DROP TABLE x")
    }
  }
}
