package graft.tools

import graft.{GraftSession, SessionHygiene, SparkEntry}

/** Dev tool: isolated steady-state timing of individual registry queries —
  * one fresh JVM, warm-then-measure twice, best-of-two (the Bench.scala
  * protocol) without the other ~100 queries sharing the session. Use to
  * separate a query's inherent cost from in-bench session effects (GC,
  * listener bus, code-cache pressure).
  * Run: sbt "runMain graft.tools.TimeQuery <sfDir> <name> [name...]" */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.head
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val settle = sys.env.getOrElse("GRAFT_SETTLE_MS", "0").toLong
      once() // warm: plan + codegen + JIT
      SessionHygiene.dropAllStorage(spark)
      if (settle > 0) Thread.sleep(settle)
      val r1 = once()
      SessionHygiene.dropAllStorage(spark)
      if (settle > 0) Thread.sleep(settle)
      val r2 = once()
      SessionHygiene.dropAllStorage(spark)
      println(f"TIME $name ${math.min(r1, r2)}%.2f")
    }
    spark.stop()
  }
}
