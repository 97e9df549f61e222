package graft.sync

import org.apache.spark.sql.types._

/** Schema-migration planner (SURVEY §2.9 Y27) — the full-diff complement
  * to [[SchemaDrift]] (which handles add/remove only, mid-sync): given
  * the target's CURRENT schema and the DESIRED one, emit an ordered,
  * safety-classified ALTER plan a DBA could hand to the target store.
  *
  * Three design rules, each a real-world sync-tool constraint:
  *
  *  1. **Expand → migrate → contract ordering.** Adds ship first, type
  *     changes second, drops last — every intermediate schema can serve
  *     BOTH the old and the new reader, so the plan is deployable with
  *     zero-downtime rollouts (the standard online-migration order).
  *  2. **Safety is explicit, and `incompatible` is never auto-applied.**
  *     `safe` = value-preserving (widening), `lossy` = defined but
  *     value-destroying cast (narrowing, double→decimal), `incompatible`
  *     = no meaningful cast (string→int is a PARSE, timestamp→bigint an
  *     ENCODING — both need a human decision). Incompatible steps emit
  *     `action = 'manual'` with NO ddl — the y23-conflict philosophy
  *     applied to DDL.
  *  3. **Key columns never migrate.** A PK type change invalidates every
  *     downstream diff/merge keyed on it and usually means a table
  *     rebuild; the planner refuses loudly instead of emitting a
  *     footgun.
  *
  * Purely driver-side metadata arithmetic over footer schemas — no data
  * is scanned, so the "query" cost at 100 TB is zero; nullability is
  * ignored (tightened post-backfill, per [[TypeMapping.alterAddDdl]]).
  */
object Migration {

  /** One migration step; `ddl` is None exactly when `action = manual`. */
  final case class Step(
      step_order: Int,
      action: String,       // add | alter | manual | drop
      column: String,
      from_type: Option[String],  // T-SQL rendering, None for adds
      to_type: Option[String],    // None for drops
      safety: String,             // safe | lossy | incompatible
      ddl: Option[String])

  /** Integer capacity in decimal digits — what a DecimalType must hold
    * to accept the integral type losslessly. */
  private def intDigits(dt: DataType): Option[Int] = dt match {
    case ByteType    => Some(3)   // ±127
    case ShortType   => Some(5)   // ±32767
    case IntegerType => Some(10)  // ±2147483647
    case LongType    => Some(19)  // ±9223372036854775807
    case _           => None
  }

  /** Classify a type CHANGE (from != to). The matrix follows cast
    * semantics, not representability folklore:
    *  - integral widening, float→double, date→timestamp, anything→string
    *    preserve every value → safe
    *  - integral/float narrowing, double/float→decimal (binary fractions
    *    don't land on decimal grids), decimal precision/scale shrink,
    *    timestamp→date preserve SOME values → lossy
    *  - string→anything (a parse), temporal↔numeric (an encoding
    *    choice), and everything else → incompatible
    */
  def changeSafety(from: DataType, to: DataType): String = (from, to) match {
    case (a, b) if a == b => "safe" // no-op; plan() never emits it
    // widenings
    case (ByteType, ShortType | IntegerType | LongType)    => "safe"
    case (ShortType, IntegerType | LongType)               => "safe"
    case (IntegerType, LongType)                           => "safe"
    case (FloatType, DoubleType)                           => "safe"
    case (DateType, TimestampType)                         => "safe"
    // any scalar renders losslessly as text (binary would be a charset
    // GUESS, complex types a serialization choice — those stay manual)
    case (f, StringType) if !f.isInstanceOf[ArrayType] &&
      !f.isInstanceOf[MapType] && !f.isInstanceOf[StructType] &&
      f != BinaryType && f != NullType                     => "safe"
    case (i, d: DecimalType) if intDigits(i).isDefined =>
      if (d.precision - d.scale >= intDigits(i).get) "safe" else "lossy"
    case (d1: DecimalType, d2: DecimalType) =>
      if (d2.precision - d2.scale >= d1.precision - d1.scale &&
        d2.scale >= d1.scale) "safe" else "lossy"
    // narrowings: defined cast, loses values
    case (LongType, IntegerType | ShortType | ByteType)    => "lossy"
    case (IntegerType, ShortType | ByteType)               => "lossy"
    case (ShortType, ByteType)                             => "lossy"
    case (DoubleType, FloatType)                           => "lossy"
    case (DoubleType | FloatType, _: DecimalType)          => "lossy"
    case (d: DecimalType, i) if intDigits(i).isDefined =>
      "lossy" // fractional part and/or range drop
    case (_: DecimalType, DoubleType | FloatType)          => "lossy"
    case (TimestampType, DateType)                         => "lossy"
    // everything else needs a human: parses, encodings, shape changes
    case _                                                 => "incompatible"
  }

  /** The ordered plan. Ordering inside each phase is by column name —
    * deterministic, and phases never interleave (rule 1). */
  def plan(current: StructType, desired: StructType, table: String,
           keyCols: Seq[String]): Seq[Step] = {
    val cur = current.fields.map(f => f.name.toLowerCase -> f).toMap
    val des = desired.fields.map(f => f.name.toLowerCase -> f).toMap
    for (k <- keyCols.map(_.toLowerCase)) {
      require(cur.contains(k) && des.contains(k),
        s"Migration.plan: key column $k must exist on both sides")
      require(cur(k).dataType == des(k).dataType,
        s"Migration.plan: key column $k changes type " +
          s"(${cur(k).dataType.simpleString} -> ${des(k).dataType.simpleString})" +
          " — a PK migration is a table rebuild, not an ALTER; refusing")
    }
    def tsql(dt: DataType) = TypeMapping.toSqlServerType(dt)
    val adds = des.keys.toSeq.diff(cur.keys.toSeq).sorted.map { c =>
      Step(1, "add", des(c).name, None, Some(tsql(des(c).dataType)), "safe",
        Some(TypeMapping.alterAddDdl(table, Seq(des(c))).head))
    }
    val alters = cur.keys.toSeq.intersect(des.keys.toSeq).sorted.flatMap { c =>
      val (f, t) = (cur(c).dataType, des(c).dataType)
      if (f == t) None
      else changeSafety(f, t) match {
        case "incompatible" =>
          Some(Step(3, "manual", cur(c).name, Some(tsql(f)), Some(tsql(t)),
            "incompatible", None))
        case s =>
          Some(Step(2, "alter", cur(c).name, Some(tsql(f)), Some(tsql(t)), s,
            Some(TypeMapping.alterColumnDdl(table, cur(c).name, t))))
      }
    }
    val drops = cur.keys.toSeq.diff(des.keys.toSeq).sorted.map { c =>
      Step(4, "drop", cur(c).name, Some(tsql(cur(c).dataType)), None, "lossy",
        Some(TypeMapping.dropColumnDdl(table, cur(c).name)))
    }
    (adds ++ alters ++ drops).sortBy(s => (s.step_order, s.column))
  }
}
