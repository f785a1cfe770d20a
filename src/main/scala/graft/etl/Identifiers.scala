package graft.etl

/** Identifier normalization — mirror of the reference's two cleaning
  * passes (they differ subtly and both are preserved):
  *
  *  - transform-side (reference src/transforms/normalize.py:66):
  *    lowercase; replace only `/` and `:` with `_`.
  *  - loader-side (reference src/loaders/postgresql.py:109-123):
  *    lowercase; replace `/ : - space .` with `_`; prefix a leading
  *    digit with `_`.
  *  - table-name derivation from a storage path (reference
  *    src/main.py:213-227): first path segment, lowercase, `-`→`_`,
  *    all-digit names get an `account_` prefix.
  *
  * Pure functions — applied to schemas on the driver, never per-row.
  */
object Identifiers {

  /** normalize.py:66 semantics. */
  def cleanTransform(name: String): String =
    name.toLowerCase.replace("/", "_").replace(":", "_")

  /** postgresql.py:109-123 semantics. */
  def cleanLoader(name: String): String = {
    val cleaned = name.toLowerCase
      .replace("/", "_").replace(":", "_").replace("-", "_")
      .replace(" ", "_").replace(".", "_")
    if (cleaned.nonEmpty && cleaned.head.isDigit) "_" + cleaned else cleaned
  }

  /** main.py:213-227 semantics: derive a table identifier from the first
    * segment of a storage-relative path. */
  def tableNameFromPath(path: String): String = {
    val first = path.stripPrefix("/").split("/").head
    val cleaned = first.toLowerCase.replace("-", "_")
    if (cleaned.nonEmpty && cleaned.forall(_.isDigit)) s"account_$cleaned" else cleaned
  }

  /** Apply loader-side cleaning to every column of a schema, de-dupe by
    * appending a positional suffix on collision (stable, first wins). */
  def cleanColumns(names: Seq[String]): Seq[String] =
    dedupe(names.map(cleanLoader))

  /** Transform-side cleaning over a schema with the same collision
    * discipline: two raw headers cleaning to one name (e.g.
    * `lineItem/UsageStartDate` + `lineitem_usagestartdate`) must not
    * produce a duplicate-column frame (ambiguous-reference at resolve). */
  def cleanTransformColumns(names: Seq[String]): Seq[String] =
    dedupe(names.map(cleanTransform))

  private def dedupe(cleaned: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.HashMap.empty[String, Int]
    cleaned.map { c =>
      val k = seen.getOrElse(c, 0)
      seen(c) = k + 1
      if (k == 0) c else s"${c}_$k"
    }
  }
}
