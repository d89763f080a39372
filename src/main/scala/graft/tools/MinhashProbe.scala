package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.GraftSession

/** Dev probe: stage-level timing of the unguarded d07 LSH plan on a
  * corpus dir — separates shingle build, candidate generation, and
  * exact-Jaccard verification, with a per-stage task-count listener.
  * Built to adjudicate the round-12 skew-run anomaly (a silent local[4]
  * fallback made the CPU-bound verification stage look like a 3x
  * operator regression); kept because "which stage, how many tasks" is
  * the first question every LSH timing question reduces to.
  * Run: sbt "runMain graft.tools.MinhashProbe <corpusDir>" */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          println(s"STAGE ${si.stageId} tasks=${si.numTasks} ms=" +
            s"${si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)}")
        }
      })
    val docs = graft.sources.Tables.documents(spark, args.head)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    // the d07 plan, stage by stage (mirrors MinHashDedup.verifiedPairs —
    // duplicated here deliberately so stages can be timed in isolation
    // without widening the operator's API)
    val sh = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), shingles(col("toks"), 3).as("s"))
      .filter(size(col("s")) > 0)
      .cache()
    t("shingles")(sh.count())
    val sig = sh
      .withColumn("h", transform(col("s"), x => hash28(x)))
      .select(col("doc_id"), minhashSignature(col("h")).as("sig"))
    val bands = sig.select(col("doc_id"),
      posexplode(bandKeys(col("sig"), 4, 4)).as(Seq("b", "bh")))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bh") === col("y.bh")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    t("cand_distinct")(cand.count())
    t("full_verifiedPairs")(
      graft.operators.MinHashDedup.verifiedPairs(docs, 0.7)
        .orderBy("doc_a", "doc_b").count())
    spark.stop()
  }
}
