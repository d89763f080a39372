package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Physical-plan shape assertions for in-engine gates — the registered
  * queries don't just require the right ROWS, they require the plan that
  * stays affordable at 100 TB (e.g. a delta-vs-index probe must stream
  * the index with the delta broadcast: ZERO shuffle exchanges, because an
  * index-side exchange re-shuffles the O(corpus) index every micro-batch).
  */
object PlanChecks {

  /** Fully unnest an executed plan: AQE wrappers and materialized query
    * stages hold their subtrees in non-children fields, so a plain
    * `plan.collect` stops at the stage boundary. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => flatten(q.plan)
    case _ => p.children.flatMap(flatten)
  })

  /** True when the plan of `df`'s query contains NO shuffle exchange
    * anywhere (broadcast exchanges are allowed — they ship the small
    * side, which is the point). Valid both before and after AQE
    * finalization: the initial adaptive plan already carries every
    * exchange the static planner inserted, and AQE never ADDS a shuffle
    * to a shuffle-free plan. */
  def shuffleFree(df: DataFrame): Boolean =
    !flatten(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[ShuffleExchangeLike])
}
