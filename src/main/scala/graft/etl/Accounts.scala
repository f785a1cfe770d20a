package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Account registry + filter-predicate builder — mirror of the
  * reference's account config and WHERE-clause assembly
  * (reference src/accounts.py:3-72, src/sources/aws_cur.py:77-118).
  *
  * The reference renders SQL strings by interpolation (an injection
  * hazard, aws_cur.py:82,92,103); here predicates are composed as
  * Catalyst `Column` expressions, so they push down into the parquet
  * scan and are immune to quoting bugs.
  */
object Accounts {

  final case class Account(id: String, name: String, regionFilter: Option[String] = None)

  /** Registry shape mirrors accounts.py: a handful of accounts, exactly
    * one with a region restriction (accounts.py:38). */
  val registry: Seq[Account] = Seq(
    Account("111111111111", "prod-main"),
    Account("222222222222", "prod-data"),
    Account("333333333333", "staging"),
    Account("444444444444", "dev"),
    Account("905174205951", "apac-edge", regionFilter = Some("ap-southeast-2")))

  /** Env override mirroring TEST_ACCOUNTS (accounts.py:54-64). */
  def activeIds(env: Map[String, String] = sys.env): Seq[String] =
    env.get("TEST_ACCOUNTS") match {
      case Some(csv) if csv.trim.nonEmpty => csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case _ => registry.map(_.id)
    }

  def accountName(id: String): Option[String] = registry.find(_.id == id).map(_.name)

  def regionFilter(id: String): Option[String] =
    registry.find(_.id == id).flatMap(_.regionFilter)

  /** Build the scan predicate for a set of accounts
    * (aws_cur.py:85-118 semantics):
    *  - accounts with a region rule contribute `(acct = id AND region = r)`;
    *  - accounts without contribute a plain IN-list;
    *  - an account with a region rule is excluded from the IN-list branch;
    *  - the composite OR of both branches is returned; with no region
    *    rules it degenerates to the plain IN-list (aws_cur.py:108-118).
    */
  def predicate(
      ids: Seq[String],
      accountCol: Column = col("line_item_usage_account_id"),
      regionCol: Column = col("product_region")): Option[Column] = {
    if (ids.isEmpty) return None
    val withRegion = ids.flatMap(id => regionFilter(id).map(r => (id, r)))
    val plain = ids.filterNot(withRegion.map(_._1).contains)
    val regionPreds = withRegion.map { case (id, r) => accountCol === id && regionCol === r }
    val inPred = if (plain.nonEmpty) Some(accountCol.isin(plain: _*)) else None
    (regionPreds ++ inPred).reduceOption(_ || _)
  }
}
