package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** Schema drift mid-sync (SURVEY §2.1 S10 × §2.9 Y3): the source table
  * gained and/or lost columns relative to the target since the last sync.
  * The lifecycle stays the unchanged [[SyncJob]] diff→apply→validate — the
  * drift is resolved BEFORE it, declaratively:
  *
  *  - `plan` computes the drift (added / removed value columns) and the
  *    `ALTER TABLE ... ADD` DDL the target store needs (via
  *    [[TypeMapping]]); key columns are required on both sides and never
  *    drift.
  *  - `align` widens both sides to the union schema with null-filled
  *    placeholder columns — `unionByName(allowMissingColumns)` semantics
  *    applied to each side separately, so the full-outer diff join and the
  *    upsert's unionByName see identical schemas. Pure per-row projection:
  *    no extra shuffle, no data movement beyond the sync's own joins.
  *
  * Comparison semantics on drift columns are source-wins like everything
  * else: a source-gained column makes every row whose target value (null
  * placeholder) differs an Update; a source-dropped column reads as null
  * from the source, so rows with non-null target values become Updates
  * that null the column out on apply. A row identical under the union
  * schema stays Same.
  */
object SchemaDrift {

  import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

  /** The type with every nested nullability flag forced true — equality
    * on the result is "same type modulo nullability". */
  private def allNullable(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = allNullable(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(allNullable(a.elementType), containsNull = true)
    case m: MapType => MapType(allNullable(m.keyType),
      allNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  final case class DriftPlan(
      added: Seq[StructField],     // in source, not target
      removed: Seq[StructField],   // in target, not source
      alterDdl: Seq[String])       // DDL for `added` on the target store

  def plan(source: DataFrame, target: DataFrame,
           targetTable: String, keyCols: Seq[String]): DriftPlan = {
    // case-INSENSITIVE name comparison, matching Spark's default column
    // resolution and SyncJob.rowDigest's documented tolerance for JDBC
    // case divergence (O_CUSTKEY vs o_custkey): a case-only difference is
    // the same column, not drift — treating it as added+removed would
    // make align()'s case-insensitive withColumn REPLACE the real source
    // column with a null literal and silently wipe its data on apply
    val tCols = target.schema.fieldNames.map(_.toLowerCase).toSet
    val sCols = source.schema.fieldNames.map(_.toLowerCase).toSet
    val keys = keyCols.map(_.toLowerCase).toSet
    require(keyCols.forall(k =>
      tCols.contains(k.toLowerCase) && sCols.contains(k.toLowerCase)),
      s"key columns $keyCols must exist on both sides; drift keys are a " +
        "re-key migration, not a sync")
    val added = source.schema.fields.toSeq
      .filter(f => !tCols.contains(f.name.toLowerCase) &&
        !keys.contains(f.name.toLowerCase))
    val removed = target.schema.fields.toSeq
      .filter(f => !sCols.contains(f.name.toLowerCase) &&
        !keys.contains(f.name.toLowerCase))
    // TYPE drift on a name-matched column (e.g. INT→BIGINT widening at the
    // source) is NOT add+remove — silently treating it as no-drift would
    // let the digest compare or unionByName coerce lossily (or fail deep
    // in the plan). It needs an explicit ALTER COLUMN migration the target
    // store must run first, so refuse loudly rather than guess a cast.
    // compare modulo nullability (normalized recursively: struct-field
    // nullable, array containsNull, map valueContainsNull): JDBC vs
    // parquet round-trips flip nullability flags freely, and a
    // nullability-only difference unions/compares losslessly — refusing
    // on it would hard-fail a previously-working sync on a non-change.
    // Deliberate asymmetry accepted: a source that is GENUINELY nullable
    // against a NOT NULL target column now passes this gate and fails at
    // write time instead — but Spark-side nullability flags are too
    // unreliable (parquet/JDBC readers often report nullable regardless
    // of data) to refuse on; the target store's own constraint remains
    // the enforcement point
    val tTypes = target.schema.fields
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    val retyped = source.schema.fields.toSeq.flatMap { f =>
      tTypes.get(f.name.toLowerCase)
        .filter(t => allNullable(t) != allNullable(f.dataType))
        .map(t => s"${f.name}: target $t vs source ${f.dataType}")
    }
    require(retyped.isEmpty,
      "type drift on name-matched columns needs an explicit ALTER COLUMN " +
        s"migration before syncing, not a silent cast: ${retyped.mkString("; ")}")
    DriftPlan(added, removed, TypeMapping.alterAddDdl(targetTable, added))
  }

  /** Widen both frames to the union schema (source column order, then
    * target-only columns), null-filling what each side lacks.
    */
  def align(source: DataFrame, target: DataFrame,
            drift: DriftPlan): (DataFrame, DataFrame) = {
    val widenedSource = drift.removed.foldLeft(source) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val widenedTarget = drift.added.foldLeft(target) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    (widenedSource, widenedTarget.select(
      widenedSource.columns.map(col).toSeq: _*))
  }

  /** The composed drift-aware lifecycle: plan → align → SyncJob.run with
    * the compare set extended by the drift columns (so a drifted value is
    * an Update, not invisible). Returns the drift plan alongside the
    * ordinary result + report; the caller executes `alterDdl` on the
    * target store before writing the result back.
    */
  def run(source: DataFrame, target: DataFrame, targetTable: String,
          cfg: SyncJob.SyncConfig)
      : (DataFrame, SyncJob.SyncReport, DriftPlan) = {
    val drift = plan(source, target, targetTable, cfg.keyCols)
    val (s, t) = align(source, target, drift)
    val driftCols = (drift.added ++ drift.removed).map(_.name)
    val cfg2 = cfg.copy(compareCols =
      (cfg.compareCols ++ driftCols).distinct)
    val (result, report) = SyncJob.run(s, t, cfg2)
    (result, report, drift)
  }
}
