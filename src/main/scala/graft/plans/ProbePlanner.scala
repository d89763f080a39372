package graft.plans

import org.apache.spark.sql.SparkSession

/** The ONE probe-planner threshold shared by every scan-scaled probe
  * (CurationStream's fp/band/gram gates, MinHashDedup's indexed probe,
  * TxnLake's DML key scoping and DV decode): how many keys may a
  * per-batch probe collect to the driver before the plan must keep the
  * key set distributed. Session-configurable because "daily volume" is
  * a deployment property, not an engine constant; the 1M default sits
  * between the measured ends of the r14/r15 SCALE curves (165k band
  * keys still won collected at factor 30; 2M window grams lost at
  * factor 10). The r16 verdict asked for the caps to be unified here —
  * MinHashDedup previously hard-coded 4M in two places.
  *
  * Above the cap the probes do NOT fall back to an O(index) scan any
  * more: the kept-file membership decision itself moves to the
  * executors ([[graft.sources.TxnLake.readKeyedDistributed]]), so the
  * cap bounds only what the driver holds, never the pruning.
  */
object ProbePlanner {

  val DefaultMaxDriverKeys: Long = 1000000L

  def maxDriverKeys(s: SparkSession): Long =
    s.conf.getOption("graft.probe.maxDriverKeys").map(_.toLong)
      .getOrElse(DefaultMaxDriverKeys)
}
