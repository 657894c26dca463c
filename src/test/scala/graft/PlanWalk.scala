package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** The one plan-flattening walker the physical-plan specs share: AQE
  * wraps the real tree in AdaptiveSparkPlanExec / materialized
  * QueryStageExec nodes and cached relations hide their build plan
  * inside InMemoryTableScanExec — a TreeNode.collect sees none of
  * those subtrees. Cycle-guarded (reused exchanges/stages alias
  * nodes).
  */
object PlanWalk {

  def allNodes(p: SparkPlan,
               seen: java.util.IdentityHashMap[SparkPlan, Boolean] =
                 new java.util.IdentityHashMap()): Seq[SparkPlan] = {
    if (seen.containsKey(p)) return Nil
    seen.put(p, true)
    val extra: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
      case _ => Nil
    }
    p +: (p.children ++ extra ++ p.subqueries).flatMap(allNodes(_, seen))
  }
}
