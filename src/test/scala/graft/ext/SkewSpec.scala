package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  private def skewed = {
    import spark.implicits._
    // 10k rows of one hot key + a long tail
    ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong)))
      .toDF("k", "v")
  }

  private def dim = {
    import spark.implicits._
    (Seq(("hot", "H")) ++ (1 to 100).map(i => (s"k$i", s"D$i")))
      .toDF("k", "label")
  }

  test("salted inner join returns exactly the plain join's result") {
    val plain = skewed.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join preserves unmatched rows") {
    import spark.implicits._
    val big = skewed.union(Seq(("orphan", 0L)).toDF("k", "v"))
    val salted = Skew.saltedJoin(big, dim, Seq("k"), factor = 4, joinType = "left")
    assert(salted.filter(col("k") === "orphan").count() == 1)
    assert(salted.filter(col("k") === "orphan" && col("label").isNull).count() == 1)
    assert(salted.count() == big.count())
  }

  test("the hot key actually spreads across salt buckets") {
    val salts = skewed.filter(col("k") === "hot")
      .withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"expected the hot key across most of 8 buckets, got $salts")
  }

  test("keyHistogram surfaces the hot key first") {
    val top = Skew.keyHistogram(skewed, Seq("k"), 3).collect()
    assert(top.head.getString(0) == "hot" && top.head.getLong(1) == 10000L)
  }
}
