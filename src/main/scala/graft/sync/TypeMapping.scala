package graft.sync

import org.apache.spark.sql.types._

/** T-SQL ↔ Spark type mapping for sync planning (SURVEY.md §2.9 Y1).
  *
  * A sync utility sees the source as `INFORMATION_SCHEMA.COLUMNS` rows
  * (DATA_TYPE name + CHARACTER_MAXIMUM_LENGTH / NUMERIC_PRECISION /
  * NUMERIC_SCALE / IS_NULLABLE) long before any JDBC scan runs: it must
  * plan the Spark schema, validate it against an existing target, and —
  * for first-time syncs — emit target DDL. Spark's built-in
  * MsSqlServerDialect handles the JDBC-metadata path at read time; this
  * object handles the *planning* path, where only the catalog text is
  * available, and the reverse (Spark schema → T-SQL DDL) which no
  * dialect provides.
  *
  * Mapping choices, where T-SQL has no exact Spark twin:
  *  - money/smallmoney → DECIMAL(19,4)/DECIMAL(10,4) (their defined
  *    precision — exact, unlike a double).
  *  - datetimeoffset → StringType: Spark timestamps are UTC-normalized
  *    instants, so round-tripping the offset through a timestamp silently
  *    rewrites the stored text; the string form is lossless.
  *  - time(p) → StringType for the same round-trip-fidelity reason.
  *  - uniqueidentifier/xml/sysname → StringType.
  *  - tinyint → ShortType: T-SQL tinyint is UNSIGNED 0..255; Spark's
  *    ByteType is signed -128..127 and would overflow the upper half.
  */
object TypeMapping {

  /** One `INFORMATION_SCHEMA.COLUMNS` row, as a sync planner sees it. */
  final case class ColumnMeta(
      name: String,
      dataType: String,              // DATA_TYPE, e.g. "nvarchar"
      charLength: Option[Int] = None, // CHARACTER_MAXIMUM_LENGTH (-1 = MAX)
      precision: Option[Int] = None,  // NUMERIC_PRECISION
      scale: Option[Int] = None,      // NUMERIC_SCALE
      nullable: Boolean = true)       // IS_NULLABLE

  /** T-SQL catalog type name → Spark type (Y1 planning direction). */
  def toSparkType(m: ColumnMeta): DataType = m.dataType.toLowerCase match {
    case "bigint"                       => LongType
    case "int"                          => IntegerType
    case "smallint"                     => ShortType
    case "tinyint"                      => ShortType // unsigned 0..255
    case "bit"                          => BooleanType
    case "decimal" | "numeric"          =>
      DecimalType(m.precision.getOrElse(38), m.scale.getOrElse(0))
    case "money"                        => DecimalType(19, 4)
    case "smallmoney"                   => DecimalType(10, 4)
    case "float"                        => DoubleType // float(53)
    case "real"                         => FloatType
    case "date"                         => DateType
    case "datetime" | "datetime2" | "smalldatetime" => TimestampType
    case "datetimeoffset"               => StringType // lossless (see doc)
    case "time"                         => StringType
    case "char" | "varchar" | "text" | "nchar" | "nvarchar" | "ntext" |
         "uniqueidentifier" | "xml" | "sysname" => StringType
    case "binary" | "varbinary" | "image" | "rowversion" | "timestamp" =>
      BinaryType // T-SQL timestamp/rowversion is a binary row version
    case other =>
      throw new IllegalArgumentException(s"unmapped T-SQL type: $other")
  }

  /** INFORMATION_SCHEMA rows → the Spark schema a sync plans against. */
  def toStructType(cols: Seq[ColumnMeta]): StructType =
    StructType(cols.map(m => StructField(m.name, toSparkType(m), m.nullable)))

  /** Spark type → target T-SQL column type (DDL direction). Strings and
    * binaries go to MAX variants: a sync target must accept any source
    * width, and MS-SQL stores short values in-row regardless.
    */
  def toSqlServerType(dt: DataType): String = dt match {
    case LongType            => "BIGINT"
    case IntegerType         => "INT"
    case ShortType           => "SMALLINT"
    case ByteType            => "SMALLINT" // no signed 1-byte type in T-SQL
    case BooleanType         => "BIT"
    case d: DecimalType      => s"DECIMAL(${d.precision},${d.scale})"
    case DoubleType          => "FLOAT"
    case FloatType           => "REAL"
    case DateType            => "DATE"
    case TimestampType       => "DATETIME2(6)" // Spark timestamps are µs
    case StringType          => "NVARCHAR(MAX)"
    case BinaryType          => "VARBINARY(MAX)"
    case other =>
      throw new IllegalArgumentException(s"no T-SQL DDL mapping for $other")
  }

  /** CREATE TABLE for a first-time sync target. Identifiers are
    * bracket-quoted with embedded `]` doubled (the T-SQL escape), so a
    * hostile column name cannot break out of the identifier position.
    * The table argument is split on `.` and each part quoted separately
    * ("dbo.orders" → [dbo].[orders]) — quoting it whole would create a
    * dotted-NAME table in the caller's default schema instead of the
    * intended schema-qualified target.
    */
  /** The ONE implementation of the T-SQL identifier escape (`]` doubling)
    * — it is the injection guard both DDL paths rely on, so it must not
    * fork. */
  private def q(id: String) = "[" + id.replace("]", "]]") + "]"
  private def qualify(table: String) = table.split('.').map(q).mkString(".")

  def createTableDdl(table: String, schema: StructType,
                     keyCols: Seq[String] = Nil): String = {
    val qualified = qualify(table)
    val cols = schema.fields.map { f =>
      s"${q(f.name)} ${toSqlServerType(f.dataType)}" +
        (if (f.nullable) " NULL" else " NOT NULL")
    }
    val pk = if (keyCols.isEmpty) Nil
      else Seq(s"PRIMARY KEY (${keyCols.map(q).mkString(", ")})")
    s"CREATE TABLE $qualified (\n  " +
      (cols ++ pk).mkString(",\n  ") + "\n)"
  }

  /** ALTER TABLE statements for columns the source gained mid-sync. Drift
    * columns are always added NULLable regardless of the source field's
    * nullability: the target's existing rows have no value for them, and
    * T-SQL rejects ADD ... NOT NULL without a DEFAULT — the NOT NULL
    * constraint can be tightened after the first full sync backfills.
    */
  def alterAddDdl(table: String, fields: Seq[StructField]): Seq[String] =
    fields.map(f =>
      s"ALTER TABLE ${qualify(table)} ADD ${q(f.name)} ${toSqlServerType(f.dataType)} NULL")

  /** ALTER COLUMN for a type change (the Migration planner's migrate
    * phase) — same quoting discipline as the other DDL paths. */
  def alterColumnDdl(table: String, column: String, dt: DataType): String =
    s"ALTER TABLE ${qualify(table)} ALTER COLUMN ${q(column)} ${toSqlServerType(dt)}"

  /** DROP COLUMN (the contract phase). */
  def dropColumnDdl(table: String, column: String): String =
    s"ALTER TABLE ${qualify(table)} DROP COLUMN ${q(column)}"

  /** Round-trip stability law (pinned in tests): a Spark schema pushed to
    * T-SQL and read back through the planning mapping is unchanged up to
    * the documented widenings (Byte→Short, both MAX strings).
    */
  def roundTrip(schema: StructType): StructType =
    toStructType(schema.fields.toSeq.map { f =>
      val sql = toSqlServerType(f.dataType)
      val base = sql.takeWhile(c => c.isLetter).toLowerCase
      val args = "\\d+".r.findAllIn(sql.dropWhile(_ != '(')).map(_.toInt).toList
      ColumnMeta(f.name, base,
        precision = args.headOption, scale = args.drop(1).headOption,
        nullable = f.nullable)
    })
}
