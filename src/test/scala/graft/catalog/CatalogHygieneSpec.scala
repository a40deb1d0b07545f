package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ExplainAudit

/** CI-style inventory diff: keeps the catalog honest as it grows.
  * Every round-9+ query (number ≥ 402) must land in
  * [[ExplainAudit.audited]] (lazy — its plan is printed and reviewed)
  * or [[ExplainAudit.excluded]] (eager — with a stated rationale), and
  * must be mentioned in SCALE.md's scale-evidence log, so a new
  * `Q(...)` can never silently skip the plan audit or the 10× smoke
  * discipline. Also pins the two lists against typos (every name they
  * mention must exist in the catalog) and overlap. */
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

  test("every round-9+ query is plan-audited or excluded-with-" +
    "rationale, and has a SCALE.md entry") {
    val fresh = names.filter(qNum(_) >= 402)
    val inventoried =
      ExplainAudit.audited.toSet ++ ExplainAudit.excluded.keySet
    val unaudited = fresh.filterNot(inventoried)
    assert(unaudited.isEmpty,
      s"round-9+ queries missing from ExplainAudit " +
        s"audited/excluded: $unaudited")
    val unscaled = fresh.filterNot(n => scaleMd.contains(n))
    assert(unscaled.isEmpty,
      s"round-9+ queries with no SCALE.md mention: $unscaled")
  }

  test("catalog names are unique and well-formed") {
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }
}
