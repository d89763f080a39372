package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.SuffixArray

/** Dev probe for the suffix tier on a synthetic long document — times
  * each phase separately so a planner-side pathology (e.g. stats blowup)
  * can be localized. Not part of the driver contract. */
object SaProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val spark = graft.GraftSession.local()
    try {
      val block = n * 3 / 10
      val docs = spark.range(1).select(
        lit(1L).as("doc_id"),
        expr(s"""transform(sequence(0, ${n - 1}), i ->
          CASE WHEN i < $block THEN concat('blk', i)
               WHEN i >= ${n - block} THEN concat('blk', i - ${n - block})
               ELSE concat('mid', i) END)""").as("toks"))
        .cache()
      docs.count()
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
        r
      }
      val (ranks, snaps, _) = t("ranks") {
        val rs = SuffixArray.suffixRanksWithSnapshots(docs)
        rs._1.count(); rs
      }
      println(s"[probe] snapshots: ${snaps.map(_._1).mkString(",")}")
      val sa = t("saPositions") {
        val s = SuffixArray.saPositions(ranks).localCheckpoint(); s.count(); s
      }
      val lcp = t("liftedLcp") {
        val l = SuffixArray.adjacentLcpLifted(docs, sa, snaps); l.count(); l
      }
      t("maxLcp") {
        println("[probe] max lcp = " +
          lcp.agg(max(col("lcp"))).collect()(0))
      }
    } finally spark.stop()
  }
}
