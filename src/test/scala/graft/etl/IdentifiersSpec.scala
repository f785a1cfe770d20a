package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** O11/O21 identifier cleaning (reference normalize.py:66,
  * postgresql.py:109-123, main.py:213-227) incl. property checks
  * (ScalaCheck generators driven directly — no scalatestplus bridge in
  * the offline cache). */
class IdentifiersSpec extends AnyFunSuite {
  import Identifiers._

  test("transform-side cleaning replaces only / and :") {
    assert(cleanTransform("A/B:C-D E.F") == "a_b_c-d e.f")
  }

  test("loader-side cleaning replaces / : - space . and digit-prefixes") {
    assert(cleanLoader("A/B:C-D E.F") == "a_b_c_d_e_f")
    assert(cleanLoader("1total") == "_1total")
    assert(cleanLoader("Resource.Tags/user:env") == "resource_tags_user_env")
  }

  test("table name derivation: first segment, lowercase, dashes, digit rule") {
    assert(tableNameFromPath("Cur-Data/year=2024") == "cur_data")
    assert(tableNameFromPath("/123456789012/reports") == "account_123456789012")
    assert(tableNameFromPath("my-source") == "my_source")
  }

  test("column cleaning de-dupes collisions stably") {
    assert(cleanColumns(Seq("a b", "A.B", "a_b")) == Seq("a_b", "a_b_1", "a_b_2"))
  }

  private val identGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('/', ':', '-', ' ', '.', '_')))
      .map(_.mkString)

  private def samples(n: Int): Seq[String] =
    Iterator.continually(identGen.sample).flatten.take(n).toSeq

  test("property: loader cleaning is idempotent") {
    samples(300).foreach { s =>
      val once = cleanLoader(s)
      assert(cleanLoader(once) == once, s"not idempotent for: $s")
    }
  }

  test("property: cleaned identifiers contain no separators, never digit-lead") {
    samples(300).foreach { s =>
      val c = cleanLoader(s)
      assert(!c.exists("/: -.".contains(_)), s"separator survived in: $c")
      assert(c.isEmpty || !c.head.isDigit, s"digit-led: $c")
    }
  }
}
