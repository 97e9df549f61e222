package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** A named query: (session, scale-factor dir) => unexecuted plan.
    * Matches the driver contract in SparkEntry.queries.
    */
  type Q = (SparkSession, String) => DataFrame
}
