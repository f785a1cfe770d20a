package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1L, "2024-01-01", 10.0),
    (1L, "2024-01-02", 11.0),
    (2L, "2024-01-01", 20.0),
    (3L, "2024-01-02", 30.0))
    .toDF("user_id", "day", "v")

  test("forget: removes every subject row, keeps the rest") {
    val subjects = Seq(1L, 99L).toDF("user_id") // 99 absent: harmless
    val out = Privacy.forget(facts, subjects, "user_id")
      .select("user_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(2L, 3L))
  }

  test("forget: broadcast anti join — the fact side never shuffles") {
    val plan = Privacy.forget(facts, Seq(1L).toDF("user_id"), "user_id")
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join:\n$plan")
  }

  test("forgetAudit: kept/purged counts per bucket sum to the table") {
    val audit = Privacy.forgetAudit(facts, Seq(1L).toDF("user_id"), "user_id", col("day"))
      .orderBy("bucket")
      .select("bucket", "n_kept", "n_purged").as[(String, Long, Long)].collect().toSeq
    assert(audit === Seq(("2024-01-01", 1L, 1L), ("2024-01-02", 1L, 1L)))
  }

  test("pseudonymize: deterministic, salt-sensitive, NULL-preserving") {
    val df = Seq(Some("alice"), Some("alice"), Some("bob"), None).toDF("name")
      .select(Privacy.pseudonymize(col("name"), "s1").as("t1"),
        Privacy.pseudonymize(col("name"), "s2").as("t2"))
    val rows = df.as[(Option[String], Option[String])].collect().toSeq
    assert(rows(0)._1 === rows(1)._1)            // same value+salt → same token
    assert(rows(0)._1 !== rows(2)._1)            // different value → different token
    assert(rows(0)._1 !== rows(0)._2)            // different salt → different token
    assert(rows(3) === ((None, None)))           // NULL stays NULL
    assert(rows(0)._1.get.matches("[0-9a-f]{64}"))
  }

  test("generalize: floors into fixed-width bands, negatives included") {
    val out = Seq(0.0, 999.99, 1000.0, -0.01).toDF("v")
      .select(Privacy.generalize(col("v"), 1000.0).as("b"))
      .as[Double].collect().toSeq
    assert(out === Seq(0.0, 0.0, 1000.0, -1000.0))
  }

  test("forgetInWarehouse: rewrites only affected partitions, drops fully-purged ones") {
    val wh = java.nio.file.Files.createTempDirectory("graft_privacy_wh").toString
    val loader = new ParquetLoader(wh, "s")
    loader.ensureNamespace()
    loader.load(Seq(
      (1L, "d1", 10.0), (2L, "d1", 20.0), // d1: mixed → rewritten
      (1L, "d2", 11.0),                   // d2: all subject → dropped entirely
      (3L, "d3", 30.0))                   // d3: untouched, byte for byte
      .toDF("user_id", "day", "v"),
      "events", "replace", partitionBy = Seq("day"))
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def files(part: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$wh/s/events/$part")
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).filter(_.isFile).map(st =>
        (st.getPath.getName, st.getLen, st.getModificationTime)).toSeq.sortBy(_._1)
    }
    val d3Before = files("day=d3")
    assert(d3Before.nonEmpty)

    val audit = Privacy.forgetInWarehouse(spark, loader, "events",
        Seq(1L).toDF("user_id"), "user_id", Seq("day"))
      .select("bucket", "n_kept", "n_purged").as[(String, Long, Long)]
      .collect().toSeq
    assert(audit === Seq(("day=d1", 1L, 1L), ("day=d2", 0L, 1L)))

    // content: subject gone everywhere, survivors intact
    val left = loader.table(spark, "events")
      .select("user_id", "v").as[(Long, Double)].collect().toSeq.sortBy(_._1)
    assert(left === Seq((2L, 20.0), (3L, 30.0)))
    // d2 emptied → its directory is gone (dynamic overwrite alone would
    // have left the stale files in place)
    assert(files("day=d2").isEmpty)
    // d3 was never touched: same files, sizes, and mtimes
    assert(files("day=d3") === d3Before)
  }

  test("partitionMembership: null-safe, exact, and FLAT at 1k partitions") {
    val df = Seq(
      (Some("a"), Some("p"), 1), (None, Some("q"), 2),
      (Some("b"), None, 3), (Some("a"), Some("q"), 4))
      .toDF("k1", "k2", "v")
    // 1000 specs: two real (one with a NULL value) + 998 padding
    val parts: Seq[Seq[(String, String)]] =
      Seq(Seq("k1" -> null, "k2" -> "q"), Seq("k1" -> "b", "k2" -> null)) ++
        (1 to 998).map(i => Seq("k1" -> s"z$i", "k2" -> s"w$i"))
    val pred = Privacy.partitionMembership(Seq("k1", "k2"), parts)
    val out = df.filter(pred).select("v").as[Int].collect().sorted.toSeq
    assert(out === Seq(2, 3), "NULL partition values must match their own partition")
    // flat plan: ONE membership predicate, not a 1000-term OR tree
    val plan = df.filter(pred).queryExecution.optimizedPlan.toString
    assert(!plan.contains(" OR "), s"expected a set membership, got an OR chain:\n${plan.take(500)}")
    assert(plan.length < 100000, s"plan string blew up: ${plan.length} chars")
  }

  test("partitionMembership: specs match by NAME, not position") {
    val df = Seq(("a", "p", 1), ("p", "a", 2)).toDF("k1", "k2", "v")
    // the spec lists k2 first — positional matching would select row 2
    // (k1=p, k2=a); by-name matching must select row 1
    val pred = Privacy.partitionMembership(
      Seq("k1", "k2"), Seq(Seq("k2" -> "p", "k1" -> "a")))
    assert(df.filter(pred).select("v").as[Int].collect().toSeq === Seq(1))
    // a spec that doesn't cover the partition columns fails loudly
    val e = intercept[IllegalArgumentException] {
      Privacy.partitionMembership(Seq("k1", "k2"), Seq(Seq("k1" -> "a")))
    }
    assert(e.getMessage.contains("must cover partition columns"))
  }

  test("forgetInWarehouse: NULL and escape-needing partition values are purged for real") {
    val wh = java.nio.file.Files.createTempDirectory("graft_privacy_wh3").toString
    val loader = new ParquetLoader(wh, "s")
    loader.ensureNamespace()
    loader.load(Seq(
      (1L, "d:1", 10.0),          // ':' needs Hive escaping on disk → fully purged
      (1L, null.asInstanceOf[String], 11.0), // NULL partition → fully purged
      (1L, "d2", 12.0), (2L, "d2", 20.0),    // mixed → rewritten
      (3L, "d3", 30.0))                      // untouched
      .toDF("user_id", "day", "v"),
      "events", "replace", partitionBy = Seq("day"))
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dirs() = fs.listStatus(new org.apache.hadoop.fs.Path(s"$wh/s/events"))
      .filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq

    val audit = Privacy.forgetInWarehouse(spark, loader, "events",
        Seq(1L).toDF("user_id"), "user_id", Seq("day"))
      .select("bucket", "n_kept", "n_purged").as[(String, Long, Long)]
      .collect().toSeq
    assert(audit === Seq(
      ("day=d2", 1L, 1L), ("day=d:1", 0L, 1L), ("day=null", 0L, 1L)))

    // subject gone everywhere; survivors intact
    val left = loader.table(spark, "events")
      .select("user_id", "v").as[(Long, Double)].collect().toSeq.sortBy(_._1)
    assert(left === Seq((2L, 20.0), (3L, 30.0)))
    // the escaped and NULL partitions are really off the disk — no
    // stale `day=d%3A1` / `day=__HIVE_DEFAULT_PARTITION__` survivors
    assert(dirs() === Seq("day=d2", "day=d3"))
  }

  test("forgetInWarehouse: no subject rows → no-op, empty audit") {
    val wh = java.nio.file.Files.createTempDirectory("graft_privacy_wh2").toString
    val loader = new ParquetLoader(wh, "s")
    loader.ensureNamespace()
    loader.load(Seq((3L, "d1", 1.0)).toDF("user_id", "day", "v"),
      "events", "replace", partitionBy = Seq("day"))
    val audit = Privacy.forgetInWarehouse(spark, loader, "events",
      Seq(99L).toDF("user_id"), "user_id", Seq("day"))
    assert(audit.count() === 0L)
    assert(loader.table(spark, "events").count() === 1L)
  }
}
