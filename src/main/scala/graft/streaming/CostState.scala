package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over a cost stream —
  * `flatMapGroupsWithState` (the capability SURVEY §2.4 reserves for
  * semantics windows can't express): a per-account running budget
  * monitor that emits one alert the moment cumulative cost crosses the
  * budget, then stays silent for that account.
  *
  * State is one (Double, Boolean) per account — constant per key,
  * executor-partitioned, checkpointed by the engine. Pass `idleTimeout`
  * to reclaim keys idle longer than that; note ProcessingTimeTimeout
  * makes the engine trigger no-data batches to evaluate timeouts, so
  * pair it with a real trigger interval (e.g. `Trigger.ProcessingTime
  * ("1 minute")`) — with the default 0ms trigger it busy-loops. This is
  * the pattern for any "accumulate until condition, emit once" pipeline
  * (spend caps, quota trips, anomaly latches) at 100 TB: no window
  * retention, no rescan of history.
  */
object CostState {

  final case class CostEvent(account_id: String, cost: Double)
  final case class BudgetState(total: Double, alerted: Boolean)
  final case class BudgetAlert(account_id: String, total: Double, budget: Double)

  def budgetAlerts(
      spark: SparkSession,
      events: Dataset[CostEvent],
      budget: Double,
      idleTimeout: Option[String] = None): Dataset[BudgetAlert] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.account_id)
      .flatMapGroupsWithState[BudgetState, BudgetAlert](
        OutputMode.Append(), timeoutConf) {
        case (account, rows, state: GroupState[BudgetState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(BudgetState(0.0, alerted = false))
            val total = prev.total + rows.map(_.cost).sum
            val trip = !prev.alerted && total >= budget
            state.update(BudgetState(total, prev.alerted || trip))
            idleTimeout.foreach(state.setTimeoutDuration)
            if (trip) Iterator.single(BudgetAlert(account, total, budget))
            else Iterator.empty
          }
      }
  }
}
