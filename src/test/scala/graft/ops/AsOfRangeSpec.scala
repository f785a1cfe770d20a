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
}
