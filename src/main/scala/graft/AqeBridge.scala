package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bridge into the `private[sql]` side of the AQE wrapper — the
  * executed-plan audit (`graft.Explain audit-aqe`) inspects the plan
  * AQE actually ran (post re-optimization: broadcast demotions,
  * coalesced exchanges, skew splits), which the wrapper only exposes
  * inside the sql package. Same pattern as [[ColumnBridge]].
  */
object AqeBridge {
  /** The wrapper's CURRENT physical plan: the runtime-final tree once
    * the query has executed, the initial plan before.
    */
  def currentPlan(a: AdaptiveSparkPlanExec): SparkPlan = a.executedPlan
}
