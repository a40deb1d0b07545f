package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ExplainAudit

/** CI-style inventory diff: keeps the catalog honest as it grows.
  * Since round 10 the audited/excluded coverage threshold is the WHOLE
  * catalog (q1+), asserted as an exact partition by
  * CatalogPlanAuditSpec; this spec keeps the typo/overlap/rationale
  * pins and the SCALE.md scale-evidence requirement for new (≥402)
  * queries — earlier queries' scale evidence lives in SCALE.md's
  * per-family rows rather than per-query mentions. */
class CatalogHygieneSpec extends AnyFunSuite {

  private def qNum(name: String): Int =
    name.stripPrefix("q").takeWhile(_.isDigit).toInt

  private val names = Catalog.all.map(_.name)
  private lazy val scaleMd = java.nio.file.Files.readString(
    java.nio.file.Paths.get("SCALE.md"))

  test("audited and excluded lists name only real catalog queries, " +
    "and never both") {
    val known = names.toSet
    val staleA = ExplainAudit.audited.filterNot(known)
    val staleE = ExplainAudit.excluded.keys.filterNot(known)
    assert(staleA.isEmpty, s"stale audited entries: $staleA")
    assert(staleE.isEmpty, s"stale excluded entries: $staleE")
    val both = ExplainAudit.audited.toSet
      .intersect(ExplainAudit.excluded.keySet)
    assert(both.isEmpty, s"in both lists: $both")
    ExplainAudit.excluded.foreach { case (n, why) =>
      assert(why.trim.nonEmpty, s"$n excluded without a rationale")
    }
  }

  test("every query is plan-audited or excluded-with-rationale " +
    "(threshold q1), and every round-9+ query has a SCALE.md entry") {
    val inventoried =
      ExplainAudit.audited.toSet ++ ExplainAudit.excluded.keySet
    val unaudited = names.filterNot(inventoried)
    assert(unaudited.isEmpty,
      s"queries missing from ExplainAudit audited/excluded: $unaudited")
    val unscaled = names.filter(qNum(_) >= 402).filterNot(scaleMd.contains)
    assert(unscaled.isEmpty,
      s"round-9+ queries with no SCALE.md mention: $unscaled")
  }

  test("catalog names are unique and well-formed") {
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }
}
