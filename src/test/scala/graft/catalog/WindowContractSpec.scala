package graft.catalog

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-level sweep of unpartitioned global windows (round-10 task):
  * every `Window.orderBy(...)` WITHOUT a `partitionBy` in `src/main`
  * single-sorts its input through one task, so each site must be
  * either (a) behind a cardinality guard / size dispatch, or (b) over
  * a domain bounded by construction (a `limit(k)` frame, buckets,
  * calendar days) — and must appear in the allow-list below with that
  * rationale. A NEW unguarded site (new file, or an added site in an
  * allow-listed file) changes the scan result and fails this spec, so
  * the single-sort discipline is CI-enforced, not prose.
  *
  * The scan is a same-line heuristic (`Window.orderBy` with no
  * `.partitionBy` on the line) — the codebase convention puts
  * partitionBy first in the builder chain, so a partitioned window
  * never matches. Plan-level enforcement (WindowExec with empty
  * partitionSpec) is CatalogPlanAuditSpec's job; this spec covers the
  * library sites that only EAGER queries (or no catalog query) reach.
  */
class WindowContractSpec extends AnyFunSuite {

  /** file (relative to src/main/scala) → (expected site count,
    * bounded-domain / guard rationale). */
  private val allowed: Map[String, (Int, String)] = Map(
    "graft/de/Survival.scala" ->
      (7, "duration-grain windows behind maxDistinctTimes require " +
        "guards (KM, NA, logRank, coxPh) + optional timeBuckets coarsening"),
    "graft/de/Stats.scala" ->
      (5, "BH small branch (<= 2M dispatch to bhAdjustDistributed) and " +
        "holmHochberg behind its m <= 2M require"),
    "graft/ml/Ranking.scala" ->
      (3, "prCurve/liftTable windows over counted-and-guarded " +
        "threshold/bin tables (persist+count require)"),
    "graft/de/RankStats.scala" ->
      (3, "rocAuc/JT/BM windows over persist+count-guarded " +
        "(value, group) cell tables"),
    "graft/util/Ranks.scala" ->
      (2, "the <= 2M small branches of globalRowNumber/" +
        "globalRunningStats — distributed two-pass above"),
    "graft/text/TextAnalysis.scala" ->
      (2, "gateSweep suffix-sum over <= 1/step+1 buckets; RAKE rank " +
        "over a limit(topK) frame (top-k FIRST, bounded by construction)"),
    "graft/de/Inference.scala" ->
      (1, "fisherExact ln-factorial cumsum behind the maxN <= 20M require"),
    "graft/de/Experiment.scala" ->
      (1, "bayesAb ln-factorial cumsum behind the maxN <= 20M require"),
    "graft/report/Skyline.scala" ->
      (1, "x-distinct frontier domain; fact-grain callers run " +
        "localPrefilter first (documented contract)"),
    "graft/util/Quantiles.scala" ->
      (1, "last-resort ordered selection of ONE over-concentrated " +
        "histogram bucket (reached only after two narrowing levels); " +
        "never wider than the percentile aggregate's own single " +
        "reducer, which this utility replaces"),
    "graft/catalog/CatalogMisc.scala" ->
      (2, "calendar-day lag windows (q272 runs test / q273 variance " +
        "ratio daily series — bounded by the date span)"),
    "graft/catalog/CatalogGrid.scala" ->
      (1, "bucket-grain cumulative window (log2 buckets)"),
    "graft/catalog/CatalogStats4.scala" ->
      (1, "top-40 rank over nation-pair aggregates (<= C(25,2) rows)"),
    "graft/catalog/CatalogBiz2.scala" ->
      (1, "decile-grain window (10 rows by construction)"),
    "graft/ml/Uplift.scala" ->
      (1, "qiniCurve cumulative over the bucket-grain table " +
        "(≤ 10^bucketDp·range + 1 rows by construction)"))

  test("every unpartitioned Window.orderBy site in src/main is " +
    "allow-listed with a bounded-domain rationale, and the allow-list " +
    "is not stale") {
    val root = Paths.get("src/main/scala")
    val rx = raw"Window\s*\.orderBy".r
    val found: Map[String, Int] = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p: Path =>
        val rel = root.relativize(p).toString
        val n = Files.readAllLines(p).asScala.count { l =>
          rx.findFirstIn(l).isDefined && !l.contains(".partitionBy")
        }
        rel -> n
      }
      .filter(_._2 > 0).toMap
    val unlisted = found.keySet.diff(allowed.keySet)
    assert(unlisted.isEmpty,
      s"unpartitioned Window.orderBy in non-allow-listed files: " +
        s"${unlisted.map(f => s"$f (${found(f)})")} — guard the site " +
        "(require/size dispatch) and add it here with the rationale")
    val stale = allowed.keySet.diff(found.keySet)
    assert(stale.isEmpty, s"stale allow-list files (no sites remain): $stale")
    val drifted = allowed.collect {
      case (f, (n, _)) if found(f) != n => s"$f: expected $n, found ${found(f)}"
    }
    assert(drifted.isEmpty,
      s"site-count drift (new or removed unpartitioned windows): $drifted")
  }
}
