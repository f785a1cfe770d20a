package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfRangeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  test("as-of join: latest state at or before each probe, null when none") {
    import spark.implicits._
    val probes = Seq(
      (1L, "u1", ts("2024-01-01T10:00:00Z")),
      (2L, "u1", ts("2024-01-01T12:00:00Z")),
      (3L, "u1", ts("2024-01-01T09:00:00Z")), // before any state
      (4L, "u2", ts("2024-01-01T10:30:00Z"))
    ).toDF("event_id", "user_id", "ts")
    val states = Seq(
      ("u1", ts("2024-01-01T09:30:00Z"), 1.0),
      ("u1", ts("2024-01-01T11:00:00Z"), 2.0),
      ("u1", ts("2024-01-01T12:00:00Z"), 3.0), // equal ts -> visible
      ("u2", ts("2024-01-01T10:00:00Z"), 9.0)
    ).toDF("user_id", "ts", "v")
    val out = AsOfJoin.join(probes, states, "user_id", "ts", "ts", Seq("v"))
      .orderBy("event_id").collect()
    assert(out.map(r => Option(r.getAs[Any]("v"))).toSeq ==
      Seq(Some(1.0), Some(3.0), None, Some(9.0)))
  }

  test("property: as-of join equals the naive non-equi formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val probes = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(12)}", ts(f"2024-01-01T${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00Z")))
      .toDF("event_id", "k", "ts")
    val states = (1 to 200).map(i =>
      (s"k${rnd.nextInt(15)}", ts(f"2024-01-01T${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d Z".replace(" ", "")), i.toDouble))
      .toDF("k", "ts", "v")
      .dropDuplicates("k", "ts") // unique (k, ts) → deterministic ties
    val fast = AsOfJoin.join(probes, states, "k", "ts", "ts", Seq("v"))
      .select("event_id", "v")
    // naive: non-equi left join (bound inside the condition, so probes
    // with only-later states survive with null) + latest state per probe
    val st = states.select(col("k").as("sk"), col("ts").as("s_ts"), col("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id")).orderBy(col("s_ts").desc_nulls_last)
    val naive = probes.join(st,
        col("k") === col("sk") && col("s_ts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("v"))
    // collect-and-compare: exceptAll on plans sharing lineage trips an
    // attribute-binding internal error in Spark 4.1
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      df.collect().map(r => (r.getLong(0), String.valueOf(r.get(1)))).toSeq.sorted
    assert(rows(fast) == rows(naive))
  }

  test("as-of join plan has exactly one exchange (the key shuffle)") {
    import spark.implicits._
    val probes = Seq((1L, "a", ts("2024-01-01T10:00:00Z"))).toDF("event_id", "k", "ts")
    val states = Seq(("a", ts("2024-01-01T09:00:00Z"), 1.0)).toDF("k", "ts", "v")
    val plan = AsOfJoin.join(probes, states, "k", "ts", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should be join-free:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
  }

  test("banded range join equals the naive theta join") {
    import spark.implicits._
    val left = (1 to 500).map(i => (i.toLong, i * 3.7 - 200)).toDF("lid", "value")
    val right = (1 to 60).map(i => (i.toLong, i * 25.0 - 100, i * 25.0 - 100 + 90.0))
      .toDF("rid", "lo", "hi")
    val banded = RangeJoin.banded(left, right, "value", "lo", "hi", 100.0)
      .select("lid", "rid")
    val naive = left.join(right, col("value") >= col("lo") && col("value") <= col("hi"))
      .select("lid", "rid")
    assert(banded.count() > 0)
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }

  test("banded range join handles negative values and boundary inclusion") {
    import spark.implicits._
    val left = Seq((1L, -150.0), (2L, -100.0), (3L, 0.0), (4L, 49.999), (5L, 50.0))
      .toDF("lid", "value")
    val right = Seq((10L, -100.0, 50.0)).toDF("rid", "lo", "hi")
    val got = RangeJoin.banded(left, right, "value", "lo", "hi", 75.0)
      .select("lid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L, 4L, 5L)) // both boundaries inclusive
  }

  test("EQUI-KEY banded range join equals the naive equi+theta join") {
    import spark.implicits._
    // the per-entity shape (e123's attribution windows): pairs must
    // agree on the key AND sit in the band — a cross-key value match
    // must NOT pair
    val left = (1 to 400).map(i => (i.toLong, s"u${i % 7}", i * 3.7 - 200))
      .toDF("lid", "user_id", "value")
    val right = (1 to 80).map(i => (i.toLong, s"u${i % 7}", i * 12.0 - 100, i * 12.0 + 40.0))
      .toDF("rid", "user_id", "lo", "hi")
    val banded = RangeJoin.banded(left, right, Seq("user_id"), "value", "lo", "hi", 150.0)
      .select("lid", "rid")
    val naive = left.join(
      right.withColumnRenamed("user_id", "ru"),
      col("user_id") === col("ru") &&
        col("value") >= col("lo") && col("value") <= col("hi"))
      .select("lid", "rid")
    assert(banded.count() > 0)
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }
}
