package graft

import graft.ops.Fuzz

/** Maintenance tool (not a test): after widening the fuzz shape count,
  * run `sbt "Test/runMain graft.FuzzPick"` to list, per shape, candidate
  * seeds in the shape's residue class with their sf0.001 row counts —
  * then update [[Fuzz.promoted]] with one non-trivial seed per shape and
  * bump the recorded generatorVersion note. Kept in test sources so the
  * library jar never ships it.
  */
object FuzzPick {
  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val sf = "/root/testdata/sf0.001"
    val nShapes = Fuzz.nShapes
    (0 until nShapes).foreach { shape =>
      val cands = (1 to 6).map(k => shape + nShapes * k).map { seed =>
        val b = Fuzz.build(seed)
        val n = try b.df(spark, sf).count() catch { case e: Throwable => -1L }
        (seed, b.shape, n)
      }
      println(s"shape $shape: " + cands.map { case (s, sh, n) =>
        s"$s($sh)=$n" }.mkString("  "))
    }
    spark.stop()
  }
}
