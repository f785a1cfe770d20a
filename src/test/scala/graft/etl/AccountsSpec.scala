package graft.etl

import graft.SparkSpec

/** O5/O6/O7/O22: account predicate assembly (reference
  * aws_cur.py:77-118, accounts.py:54-72). Semantics checked by applying
  * the built predicate to data, not by string-matching SQL. */
class AccountsSpec extends SparkSpec {

  private def rows = {
    import spark.implicits._
    Seq(
      ("111111111111", "us-east-1"),
      ("905174205951", "ap-southeast-2"),
      ("905174205951", "us-east-1"), // region-ruled account, wrong region
      ("999999999999", "us-east-1")  // not in filter set
    ).toDF("line_item_usage_account_id", "product_region")
  }

  test("region-ruled account restricted to its region; plain accounts via IN-list") {
    val pred = Accounts.predicate(Seq("111111111111", "905174205951")).get
    val got = rows.filter(pred).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("111111111111", "us-east-1"),
      ("905174205951", "ap-southeast-2")))
  }

  test("no region rules degenerates to a plain IN-list") {
    val pred = Accounts.predicate(Seq("111111111111", "999999999999")).get
    val got = rows.filter(pred).count()
    assert(got == 2)
  }

  test("empty id list yields no predicate (scan-all)") {
    assert(Accounts.predicate(Nil).isEmpty)
  }

  test("TEST_ACCOUNTS env override wins; blank falls back to registry") {
    assert(Accounts.activeIds(Map("TEST_ACCOUNTS" -> "a, b ,,c")) == Seq("a", "b", "c"))
    assert(Accounts.activeIds(Map("TEST_ACCOUNTS" -> "  ")) == Accounts.registry.map(_.id))
    assert(Accounts.activeIds(Map.empty) == Accounts.registry.map(_.id))
  }

  test("registry lookups") {
    assert(Accounts.accountName("905174205951").contains("apac-edge"))
    assert(Accounts.regionFilter("905174205951").contains("ap-southeast-2"))
    assert(Accounts.regionFilter("111111111111").isEmpty)
  }
}
