// A DataFrame can only be built from a custom LogicalPlan via
// Dataset.ofRows, which Spark scopes private[sql]. Placing this one-line
// forwarder inside the org.apache.spark.sql namespace is the standard
// technique third-party plan extensions use to reach it (the alternative —
// reflection — is slower and more brittle). Nothing else in this file may
// grow: it exists solely to re-export ofRows to graft.plans.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
