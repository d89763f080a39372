package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with zero exchanges") {
    val s = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.lineitem(s, dir), "li_bkt", "l_orderkey")
    Bucketing.writeBucketed(
      Tables.orders(s, dir).withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bkt", "l_orderkey")

    // force the co-located merge-join path (at sf0.001 both sides fit the
    // broadcast threshold, which would hide what bucketing buys at scale)
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, bucketed) = try {
      val joined = Bucketing.coLocatedJoin(s, "li_bkt", "ord_bkt", "l_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val rows = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (joined.queryExecution.executedPlan.toString, rows)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // the join must read both bucketed scans without a key Exchange —
    // the shuffle was paid at write time
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan.take(4000))
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("Bucketed: true"), plan.take(4000))

    // and the result matches the plain (shuffling) join
    val plain = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == plain)
  }
}
