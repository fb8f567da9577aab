package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ReusedSubqueryExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared AQE-aware physical-plan traversal for plan-shape specs. AQE hides
  * materialized stages behind QueryStageExec LEAF nodes (their subplan is a
  * field, not a child), so a naive `children` walk silently skips exactly
  * the operators — shuffles above all — a plan spec exists to count. */
object PlanCheck {

  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedSubqueryExec => Seq(r.child)
      case _ => Nil
    }
    p +: (p.children ++ nested ++ p.subqueries).flatMap(allNodes)
  }

  /** Executed-plan nodes after forcing AQE to finalize. */
  def executedNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
  }
}
