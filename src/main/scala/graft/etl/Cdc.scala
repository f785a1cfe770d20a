package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: merge a changelog batch into a keyed
  * snapshot (the MERGE/upsert every warehouse load needs once sources
  * stop being append-only — the reference's loader only knows
  * overwrite/append/upsert-partitions, `postgresql.py:26-36`; row-level
  * upsert+delete is the missing fourth mode).
  *
  * Semantics: for each key, the LAST change in `orderCols` order wins.
  * A winning `U` (upsert) replaces the snapshot row (or inserts it); a
  * winning `D` deletes it; keys with no change pass through unchanged.
  *
  * Scale shape (the 100 TB case: snapshot ≫ changelog):
  *  1. the changelog collapses to one winner per key with
  *     `max_by(struct(payload), struct(orderCols))` — a single
  *     map-side-combined aggregate, no window sort, exchange carries
  *     one row per DISTINCT changed key;
  *  2. the snapshot is reduced by a LEFT ANTI join against the winner
  *     keys — anti joins broadcast (winners are the small side by
  *     assumption), so the snapshot is NEVER shuffled; a full-outer
  *     formulation would force both sides through a sort-merge
  *     exchange because broadcast full-outer hash joins don't exist;
  *  3. surviving upserts are unioned on. Net: one shuffle of the
  *     changelog, zero shuffles of the snapshot.
  *
  * Determinism: `orderCols` must totally order changes within a key
  * (e.g. ts + a unique event id); ties would make the winner
  * arbitrary, so callers pass a tiebreaker column last.
  */
object Cdc {

  /** Apply `changes` to `base`.
    *
    * @param base      keyed snapshot; one row per key (not checked — a
    *                  duplicate-keyed base passes through duplicated,
    *                  exactly as a real table scan would surface it)
    * @param changes   changelog carrying the base's columns plus `opCol`
    * @param keys      join key column names (present on both sides)
    * @param orderCols change-ordering columns, later = newer; must be
    *                  total within a key
    * @param opCol     change kind: "U" upsert, "D" delete
    * @return the merged snapshot, schema = base's
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "Cdc.applyChanges: keys must be non-empty")
    require(orderCols.nonEmpty, "Cdc.applyChanges: orderCols must be non-empty")
    val baseCols = base.columns.toSeq
    require(!baseCols.contains(opCol),
      s"Cdc.applyChanges: base must not carry the op column '$opCol'")
    val missing = (baseCols :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"Cdc.applyChanges: changes is missing columns ${missing.mkString(", ")}")
    val payload = struct((baseCols.map(col) :+ col(opCol).as("__op")): _*)
    // one winner per key: max_by is a declarative single-pass aggregate
    // (partial max per partition, merge of partials) — the window
    // row_number formulation would sort every changelog partition
    val winners = changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(orderCols.map(col): _*)).as("__w"))
      .select(keys.map(col) ++ Seq(col("__w")): _*)
    val untouched = base.join(winners.select(keys.map(col): _*),
      keys, "left_anti")
    val upserts = winners
      .filter(col("__w.__op") =!= lit("D"))
      .select(baseCols.map(c => col(s"__w.`$c`").as(c)): _*)
    untouched.unionByName(upserts)
  }

  /** Convenience single-expression ordering for (ts, unique-id) logs. */
  def byTsThen(id: String, ts: String = "ts"): Seq[String] = Seq(ts, id)

  /** The latest-state-per-key VIEW of a changelog alone (no base):
    * collapse to winners, drop deletes. Useful to seed a snapshot from
    * a log bootstrap — same aggregate shape as [[applyChanges]]. */
  def latestState(
      changes: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    val valueCols = changes.columns.toSeq.filterNot(_ == opCol)
    val payload = struct((valueCols.map(col) :+ col(opCol).as("__op")): _*)
    changes.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(orderCols.map(col): _*)).as("__w"))
      .filter(col("__w.__op") =!= lit("D"))
      .select(valueCols.map(c => col(s"__w.`$c`").as(c)): _*)
  }
}
