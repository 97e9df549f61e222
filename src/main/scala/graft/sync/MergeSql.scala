package graft.sync

/** Dialect-parameterized MERGE/DELETE statement builder for the JDBC
  * upsert sinks (SURVEY §2.9 Y5 / §2.10 Z3). The sync target is
  * "MS-SQL-shaped" but the embedded test database is Derby, and the two
  * dialects spell the single-row MERGE differently:
  *
  *  - Derby/DB2: `USING SYSIBM.SYSDUMMY1` (the one-row system table) with
  *    a bare `?` per slot — placeholders repeat across the UPDATE and
  *    INSERT branches, so each column binds twice.
  *  - T-SQL: `USING (VALUES (?, ...)) AS s (cols...)` — the row binds once
  *    into the source constructor and both branches reference `s.col`;
  *    T-SQL additionally requires the terminating semicolon.
  *
  * Each rendering returns its own bind order, so callers drive a single
  * generic binding loop regardless of dialect — the same pattern
  * TypeMapping uses for DDL (both renderings pinned in SyncJobSuite, no
  * server needed for the T-SQL side).
  */
object MergeSql {

  sealed trait Dialect
  /** Embedded Derby (DB2 family) — the e2e test target. */
  case object Derby extends Dialect
  /** Microsoft SQL Server. */
  case object TSql extends Dialect

  /** A rendered statement plus the column name bound at each `?`
    * placeholder, in order (1-based JDBC index = position + 1). */
  final case class Stmt(sql: String, bindOrder: Seq[String])

  private val ident = "[A-Za-z_][A-Za-z0-9_]*"

  private def validate(table: String, cols: Seq[String]): Unit = {
    // identifiers cannot be bound as JDBC parameters, so they are
    // interpolated — restrict to plain [schema.]name to reject injection
    // and anything that would need dialect quoting
    require(table.matches(s"$ident(\\.$ident)?"),
      s"MergeSql: invalid table identifier '$table'")
    cols.foreach(c =>
      require(c.matches(ident), s"MergeSql: invalid column identifier '$c'"))
  }

  /** Single-row keyed upsert: UPDATE the value columns when the key
    * matches, INSERT the full row when it doesn't. */
  def upsert(dialect: Dialect, table: String, key: String,
             valueCols: Seq[String]): Stmt = {
    require(valueCols.nonEmpty, "MergeSql.upsert: at least one value column")
    validate(table, key +: valueCols)
    val all = key +: valueCols
    dialect match {
      case Derby => Stmt(
        s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON t.$key = ? " +
          s"WHEN MATCHED THEN UPDATE SET ${valueCols.map(c => s"$c = ?").mkString(", ")} " +
          s"WHEN NOT MATCHED THEN INSERT (${all.mkString(", ")}) " +
          s"VALUES (${all.map(_ => "?").mkString(", ")})",
        (key +: valueCols) ++ all)
      // WITH (HOLDLOCK): MERGE under SQL Server's default isolation is a
      // documented upsert race — two concurrent statements for the same
      // absent key both see NOT MATCHED, both INSERT, one dies on the PK.
      // Task retries/speculative execution make that a real path; HOLDLOCK
      // serializes the key-range scan so the second waits and MATCHES.
      case TSql => Stmt(
        s"MERGE INTO $table WITH (HOLDLOCK) AS t " +
          s"USING (VALUES (${all.map(_ => "?").mkString(", ")})) AS s (${all.mkString(", ")}) " +
          s"ON t.$key = s.$key " +
          s"WHEN MATCHED THEN UPDATE SET ${valueCols.map(c => s"$c = s.$c").mkString(", ")} " +
          s"WHEN NOT MATCHED THEN INSERT (${all.mkString(", ")}) " +
          s"VALUES (${all.map(c => s"s.$c").mkString(", ")});",
        all)
    }
  }

  /** Keyed delete — same text in both dialects. */
  def delete(dialect: Dialect, table: String, key: String): Stmt = {
    validate(table, Seq(key))
    Stmt(s"DELETE FROM $table WHERE $key = ?", Seq(key))
  }

  /** Deterministic key-bucket membership rendered in the target's own
    * SQL — the pushdown face of y24's sampled validation: the SAME
    * predicate filters the lake side (Spark `pmod`) and the target side
    * (this text inside the dbtable subquery), so the wire carries only
    * ~1/buckets of the table per validation tick. Dialect split because
    * T-SQL has no MOD function (only the `%` operator) while Derby has
    * only MOD. Both agree with Spark's `pmod` on NON-NEGATIVE keys —
    * the only keys sampled validation accepts (it requires an integral
    * key column; negative keys would diverge MOD/% (dividend-signed)
    * from pmod (always non-negative) and silently sample different
    * rows per side). */
  def modPredicate(dialect: Dialect, column: String, buckets: Int,
      bucket: Int): String = {
    validate("DUAL", Seq(column))
    require(buckets > 0 && bucket >= 0 && bucket < buckets,
      s"MergeSql.modPredicate: bucket $bucket out of [0, $buckets)")
    dialect match {
      case Derby => s"MOD($column, $buckets) = $bucket"
      case TSql  => s"($column % $buckets) = $bucket"
    }
  }

  /** SCD2 step 1 — close the key's current version: stamp valid_to with
    * the incoming change's version and clear is_current. The
    * `valid_from < ?` guard makes replay idempotent: after the change
    * applied once, the new open row has valid_from = ver (not < ver), so
    * re-running the same change matches nothing. is_current is SMALLINT
    * 0/1, the one encoding Derby and T-SQL (BIT) both accept without
    * dialect-splitting the text. Same text in both dialects. */
  def scd2Close(dialect: Dialect, table: String, key: String): Stmt = {
    validate(table, Seq(key))
    Stmt(
      s"UPDATE $table SET valid_to = ?, is_current = 0 " +
        s"WHERE $key = ? AND is_current = 1 AND valid_from < ?",
      Seq("ver", key, "ver"))
  }

  /** SCD2 step 2 (I/U only; a delete just closes) — open the new
    * version: a MERGE keyed on ($key, valid_from) so a replayed change
    * re-UPDATEs the same history row instead of duplicating it. */
  def scd2Open(dialect: Dialect, table: String, key: String,
               valueCol: String): Stmt = {
    validate(table, Seq(key, valueCol))
    val ins = s"($key, $valueCol, valid_from, valid_to, is_current)"
    dialect match {
      // Derby needs the NULL typed inside a MERGE INSERT branch (an
      // untyped NULL NPEs at prepare time — type inference runs before
      // the column binding there)
      case Derby => Stmt(
        s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 " +
          s"ON t.$key = ? AND t.valid_from = ? " +
          s"WHEN MATCHED THEN UPDATE SET $valueCol = ? " +
          s"WHEN NOT MATCHED THEN INSERT $ins " +
          "VALUES (?, ?, ?, CAST(NULL AS BIGINT), 1)",
        Seq(key, "ver", valueCol, key, valueCol, "ver"))
      // HOLDLOCK for the same documented upsert race as [[upsert]]
      case TSql => Stmt(
        s"MERGE INTO $table WITH (HOLDLOCK) AS t " +
          s"USING (VALUES (?, ?, ?)) AS s ($key, $valueCol, valid_from) " +
          s"ON t.$key = s.$key AND t.valid_from = s.valid_from " +
          s"WHEN MATCHED THEN UPDATE SET $valueCol = s.$valueCol " +
          s"WHEN NOT MATCHED THEN INSERT $ins " +
          s"VALUES (s.$key, s.$valueCol, s.valid_from, NULL, 1);",
        Seq(key, valueCol, "ver"))
    }
  }

  /** Spark type → column DDL type, per dialect. The T-SQL column stays
    * [[TypeMapping.toSqlServerType]]'s rendering (one source of truth);
    * Derby gets its own map because the two disagree on every
    * interesting type (NVARCHAR(MAX)/VARBINARY(MAX)/BIT/DATETIME2 are
    * all T-SQL-only spellings). Strings go to VARCHAR(32672) — Derby's
    * widest comparable VARCHAR — rather than CLOB, because a CLOB
    * column cannot sit in a predicate or GROUP BY on the target side. */
  def columnType(dialect: Dialect,
      dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dialect match {
      case TSql  => TypeMapping.toSqlServerType(dt)
      case Derby => dt match {
        case LongType       => "BIGINT"
        case IntegerType    => "INTEGER"
        case ShortType      => "SMALLINT"
        case ByteType       => "SMALLINT"
        case BooleanType    => "BOOLEAN"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case DoubleType     => "DOUBLE"
        case FloatType      => "REAL"
        case DateType       => "DATE"
        case TimestampType  => "TIMESTAMP"
        case StringType     => "VARCHAR(32672)"
        case BinaryType     => "BLOB"
        case other => throw new IllegalArgumentException(
          s"no Derby DDL mapping for ${other.simpleString}")
      }
    }
  }

  /** ADD COLUMN, always nullable (the target's existing rows have no
    * value for it; tighten after a backfill). Derby requires the
    * COLUMN keyword T-SQL rejects — hence the dialect split. */
  def addColumnDdl(dialect: Dialect, table: String, column: String,
      dt: org.apache.spark.sql.types.DataType): String = {
    validate(table, Seq(column))
    dialect match {
      case Derby =>
        s"ALTER TABLE $table ADD COLUMN $column ${columnType(dialect, dt)}"
      case TSql =>
        s"ALTER TABLE $table ADD $column ${columnType(dialect, dt)} NULL"
    }
  }

  /** DROP COLUMN. Derby's RESTRICT refuses when an index or constraint
    * still references the column — the loud failure a sync wants (a
    * keyed index on a column the source dropped is an operator
    * decision, not something to cascade silently). */
  def dropColumnDdl(dialect: Dialect, table: String,
      column: String): String = {
    validate(table, Seq(column))
    dialect match {
      case Derby => s"ALTER TABLE $table DROP COLUMN $column RESTRICT"
      case TSql  => s"ALTER TABLE $table DROP COLUMN $column"
    }
  }
}
