package graft.tools

import graft.{GraftSession, SparkEntry}

/** Times a single registry query: `runMain graft.tools.TimeQuery <name> [sfDir] [reps]`.
  * Full storage cleanup between reps (SessionHygiene, same as Bench), so
  * rep 1 ≈ cold JIT and rep 2+ ≈ the steady state Bench measures.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local()
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQ $name rep=$i rows=$n sec=$dt%.3f")
      graft.SessionHygiene.dropAllStorage(spark)
    }
    spark.stop()
  }
}
