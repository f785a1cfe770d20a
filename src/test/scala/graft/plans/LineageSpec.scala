package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ordersDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lin_orders").toString
    Seq((1L, 10L, 5.0), (2L, 20L, 7.0)).toDF("o_id", "cust", "price")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    s"$dir/orders.parquet"
  }

  private lazy val custDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lin_cust").toString
    Seq((10L, "FR"), (20L, "DE")).toDF("c_id", "nation")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    s"$dir/customer.parquet"
  }

  private def orders: DataFrame = spark.read.parquet(ordersDir)
  private def customer: DataFrame = spark.read.parquet(custDir)

  test("projection: expressions attribute to every referenced source column") {
    val lin = Lineage.columnLineage(
      orders.select(col("o_id"), (col("price") * 2).as("dbl"),
        concat(col("o_id").cast("string"), lit("-"), col("cust").cast("string")).as("tag")))
    assert(lin("o_id") === Set("orders.o_id"))
    assert(lin("dbl") === Set("orders.price"))
    assert(lin("tag") === Set("orders.o_id", "orders.cust"))
  }

  test("aggregate + join: lineage crosses the join to both sources") {
    val joined = orders.join(customer, col("cust") === col("c_id"))
      .groupBy(col("nation"))
      .agg(sum(col("price")).as("total"), count(lit(1)).as("n"))
    val lin = Lineage.columnLineage(joined)
    assert(lin("nation") === Set("customer.nation"))
    assert(lin("total") === Set("orders.price"))
    assert(lin("n") === Set.empty)
    // the join keys are control dependencies, not value lineage
    assert(Lineage.controlColumns(joined) === Set("orders.cust", "customer.c_id"))
  }

  test("filter columns are control, not value, lineage") {
    val q = orders.filter(col("cust") > 5L).select(col("price"))
    assert(Lineage.columnLineage(q)("price") === Set("orders.price"))
    assert(Lineage.controlColumns(q) === Set("orders.cust"))
  }

  test("union merges lineage positionally across both sides") {
    val u = orders.select(col("price").as("v"))
      .unionByName(customer.select(col("c_id").cast("double").as("v")))
    assert(Lineage.columnLineage(u)("v") === Set("orders.price", "customer.c_id"))
  }

  test("window and generator outputs carry their inputs") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cust")).orderBy(col("o_id"))
    val lin = Lineage.columnLineage(
      orders.select(col("o_id"), sum(col("price")).over(w).as("run")))
    assert(lin("run") === Set("orders.price", "orders.cust", "orders.o_id"))
    val gen = Lineage.columnLineage(
      orders.select(explode(array(col("price"), col("price") * 2)).as("x")))
    assert(gen("x") === Set("orders.price"))
  }

  test("catalog view (the `costs` serving shape): lineage flows through to base tables") {
    // the durable-DDL pattern CostsView.createDurable emits: a UNION ALL
    // view over SQL-addressable parquet refs
    spark.sql(
      s"""CREATE OR REPLACE VIEW lin_costs AS
         |SELECT o_id AS k, price AS cost FROM parquet.`$ordersDir`
         |UNION ALL
         |SELECT c_id AS k, CAST(c_id AS DOUBLE) AS cost FROM parquet.`$custDir`
         |WHERE nation = 'FR'""".stripMargin)
    try {
      val v = spark.table("lin_costs")
      val lin = Lineage.columnLineage(v)
      assert(lin("k") === Set("orders.o_id", "customer.c_id"))
      assert(lin("cost") === Set("orders.price", "customer.c_id"))
      // the view's WHERE is a control dependency, surfaced separately
      assert(Lineage.controlColumns(v) === Set("customer.nation"))
    } finally spark.sql("DROP VIEW IF EXISTS lin_costs")
  }

  test("streaming source: readStream lineage labels by the source path") {
    val sch = spark.read.parquet(ordersDir).schema
    val stream = spark.readStream.schema(sch).parquet(ordersDir)
      .filter(col("cust") > 0L)
      .select(col("o_id"), (col("price") * 2).as("dbl"))
    val lin = Lineage.columnLineage(stream)
    assert(lin("o_id") === Set("orders.o_id"))
    assert(lin("dbl") === Set("orders.price"))
    assert(Lineage.controlColumns(stream) === Set("orders.cust"))
  }

  test("the privacy question: which served columns depend on a subject key") {
    val served = orders.join(customer, col("cust") === col("c_id"))
      .select(col("nation"), (col("price") + col("cust")).as("weird"), col("price"))
    val lin = Lineage.columnLineage(served)
    val touched = lin.filter(_._2.contains("orders.cust")).keySet
    assert(touched === Set("weird"))
  }
}
