package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/** Arbitrary keyed state on the v2 `transformWithState` API
  * (SPARK-46815, the successor of the `flatMapGroupsWithState` path
  * [[CostState]] uses): a per-user "engagement completeness" latch built
  * from the v2-only TYPED state primitives — a [[MapState]] of
  * per-event-type counts plus a [[ValueState]] latch — emitting exactly
  * one row the moment a user has produced `need` distinct event types.
  *
  * Why this API matters at 100 TB: v1 state is one opaque blob per key —
  * every update deserializes and rewrites the whole per-key state. The
  * v2 MapState maps each (key, map-entry) to its OWN state-store row, so
  * a per-type counter bump touches one RocksDB entry, not the full
  * per-user profile; TTL is per-state (not per-query timeout callbacks),
  * and multiple independent states coexist under one processor. This is
  * the shape per-entity feature profiles take in a production stream
  * (counts by dimension, distinct-dimension latches, per-entity caps).
  *
  * Determinism contract (same discipline as [[CostState.budgetAlerts]]):
  * the EMITTED SET — users reaching `need` distinct types — is a pure
  * function of the input multiset, independent of micro-batch slicing
  * and arrival order; the latch guarantees exactly-one emission. The
  * row's payload carries only order-independent fields (the key and the
  * threshold), so the batch oracle (`HAVING COUNT(DISTINCT event_type)
  * >= need`) restates it exactly.
  */
object TypeCompletion {

  final case class TypedEvent(user_id: Long, event_type: String)
  final case class Completion(account_id: Long, n_types: Int)

  /** One per-type count map + one boolean latch per user. The distinct
    * count is recovered from the map's key set (bounded by the type
    * vocabulary, a handful of entries), not stored redundantly. */
  final class Processor(need: Int)
      extends StatefulProcessor[Long, TypedEvent, Completion] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var tripped: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "type_counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      tripped = getHandle.getValueState[Boolean](
        "tripped", Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[Completion] = {
      var seen = counts.keys().size
      rows.foreach { r =>
        val t = r.event_type
        if (counts.containsKey(t)) counts.updateValue(t, counts.getValue(t) + 1L)
        else { counts.updateValue(t, 1L); seen += 1 }
      }
      val already = tripped.exists() && tripped.get()
      if (!already && seen >= need) {
        tripped.update(true)
        Iterator.single(Completion(key, need))
      } else Iterator.empty
    }
  }

  /** Latch stream: one [[Completion]] per user crossing `need` distinct
    * event types. Caller supplies the session so the encoders resolve on
    * the isolated streaming session, not the outer batch one. */
  def completions(
      spark: SparkSession,
      events: Dataset[TypedEvent],
      need: Int): Dataset[Completion] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new Processor(need), TimeMode.None(), OutputMode.Append(),
        Encoders.product[Completion])
  }
}
