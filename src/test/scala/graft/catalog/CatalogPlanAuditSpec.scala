package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.tools.{ExplainAudit, PlanAllowlist, PlanHygiene}

/** The asserting form of the plan audit (round-10 task): every AUDITED
  * (lazy) catalog query's physical plan is machine-checked for the
  * three scale-killers — CartesianProduct, BroadcastNestedLoopJoin,
  * unpartitioned Window — against [[PlanAllowlist]]'s triaged
  * (query, kind, rationale) entries. A new query with an un-triaged
  * NLJ or global window fails the suite; so does a stale allow-list
  * entry whose finding no longer fires, and so does ANY cartesian
  * (never allow-listed).
  *
  * Also pins the signed-zero registry resource against every audited
  * query's LIVE schema (the oracle-side half of the [[SignedZero]]
  * closure can never drift for a lazy query on a committed build);
  * EAGER queries' registry rows are covered by the correctness gate
  * instead — a drifted REPLACE list fails the DuckDB oracle run
  * outright — because checking their schema here would run their
  * construction jobs in the unit suite.
  */
class CatalogPlanAuditSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val qs = Catalog.queries

  test("audited ++ excluded exactly partitions the catalog (threshold " +
    "q1 — no query can skip the plan-audit discipline)") {
    val names = Catalog.all.map(_.name).toSet
    val aud = ExplainAudit.audited.toSet
    val exc = ExplainAudit.excluded.keySet
    assert(ExplainAudit.audited.size == aud.size, "duplicate audited names")
    val overlap = aud.intersect(exc)
    assert(overlap.isEmpty, s"in both lists: $overlap")
    val unclassified = names.diff(aud ++ exc)
    assert(unclassified.isEmpty,
      s"queries in neither audited nor excluded: $unclassified — run " +
        "graft.tools.CatalogInventory and classify them")
    val stale = (aud ++ exc).diff(names)
    assert(stale.isEmpty, s"stale inventory entries: $stale")
  }

  test("allow-list names only audited queries and never allows a " +
    "cartesian") {
    val aud = ExplainAudit.audited.toSet
    val notAudited = PlanAllowlist.allowed.keySet.diff(aud)
    assert(notAudited.isEmpty,
      s"allow-list entries for non-audited queries: $notAudited")
    val cart = PlanAllowlist.allowed.filter(_._2.contains("cartesian"))
    assert(cart.isEmpty, s"cartesian can never be allow-listed: ${cart.keys}")
  }

  test("every audited query's plan findings are within its allow-list, " +
    "with no stale allow-list entries, and the signed-zero registry " +
    "matches its live schema") {
    val bad = Seq.newBuilder[String]
    val fired = Map.newBuilder[String, Set[String]]
    ExplainAudit.audited.foreach { name =>
      val df = qs(name)(spark, sfDir)
      val kinds = PlanHygiene.violations(df).toSet
      fired += name -> kinds
      val allowedKinds =
        PlanAllowlist.allowed.getOrElse(name, Map.empty).keySet
      val unallowed = kinds.diff(allowedKinds)
      if (unallowed.nonEmpty)
        bad += s"$name: un-triaged plan findings $unallowed"
      // registry freshness: the oracle-side REPLACE list must mirror
      // the live schema's double columns, and the ORDER-BY gate must
      // see the live output column list
      val liveDoubles = SignedZero.doubleCols(df.schema.fields.toSeq)
      val (regDoubles, regAll) =
        SignedZero.registryFull.getOrElse(name, (Seq.empty, Seq.empty))
      if (liveDoubles != regDoubles)
        bad += s"$name: registry doubles $regDoubles != live $liveDoubles"
      if (liveDoubles.nonEmpty && regAll != df.columns.toSeq)
        bad += s"$name: registry columns $regAll != live ${df.columns.toSeq}"
    }
    val firedMap = fired.result()
    PlanAllowlist.allowed.foreach { case (name, kinds) =>
      val unused = kinds.keySet.diff(firedMap.getOrElse(name, Set.empty))
      if (unused.nonEmpty)
        bad += s"$name: stale allow-list kinds $unused no longer fire " +
          "— remove them (or the plan regressed to a better shape)"
    }
    val failures = bad.result()
    assert(failures.isEmpty,
      s"${failures.size} plan-audit failures:\n  " +
        failures.mkString("\n  ") +
        "\n(regenerate via sbt 'runMain graft.tools.CatalogInventory' " +
        "and triage new findings into PlanAllowlist)")
  }

  test("the detectors fire on planted violations (the spec would catch " +
    "a real cartesian / NLJ / global window)") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("a")
    val b = Seq(4, 5).toDF("b")
    // tiny sides auto-broadcast into an NLJ; the hint forces the real
    // CartesianProductExec a big-sides cross join would plan
    val cart = a.hint("shuffle_replicate_nl").crossJoin(b)
    assert(PlanHygiene.violations(cart).contains("cartesian"))
    val nlj = a.join(broadcast(b), $"a" < $"b")
    assert(PlanHygiene.violations(nlj).contains("nested-loop-join"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"a")
    val win = a.withColumn("rn", row_number().over(w))
    assert(PlanHygiene.violations(win).contains("unpartitioned-window"))
    // and a hygienic plan reports nothing
    val clean = a.join(b.withColumnRenamed("b", "a"), Seq("a"))
      .groupBy($"a").count()
    assert(PlanHygiene.violations(clean).isEmpty)
  }

  test("single-partition-exchange detector: repartition(1)/coalesce(1) " +
    "fire; the three bounded shapes (groupingless agg, global-window " +
    "sort, global limit) stay exempt") {
    import spark.implicits._
    val a = (1 to 100).toDF("a")
    assert(PlanHygiene.violations(a.repartition(1).groupBy($"a").count())
      .contains("single-partition-exchange"))
    assert(PlanHygiene.violations(a.coalesce(1).groupBy($"a").count())
      .contains("single-partition-exchange"))
    // groupingless aggregate: Spark's own SinglePartition final stage
    assert(!PlanHygiene.violations(a.agg(sum($"a")))
      .contains("single-partition-exchange"))
    // global sort window: reported once, as unpartitioned-window
    val w = org.apache.spark.sql.expressions.Window.orderBy($"a")
    val winV = PlanHygiene.violations(a.withColumn("rn",
      row_number().over(w)))
    assert(winV.contains("unpartitioned-window") &&
      !winV.contains("single-partition-exchange"))
    // global limit and global (range) sort are not single-partition
    assert(!PlanHygiene.violations(a.orderBy($"a").limit(3))
      .contains("single-partition-exchange"))
    assert(!PlanHygiene.violations(a.orderBy($"a"))
      .contains("single-partition-exchange"))
  }

  test("unpushed-scan-filter detector: a filter Spark cannot translate " +
    "at all fires; a normal column predicate (pushed) does not") {
    import spark.implicits._
    val scan = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val opaque = udf((s: String) => s != null && s.startsWith("A"))
    assert(PlanHygiene.violations(scan.filter(opaque($"r_name")))
      .contains("unpushed-scan-filter"))
    assert(!PlanHygiene.violations(scan.filter($"r_regionkey" > 1))
      .contains("unpushed-scan-filter"))
    // no filter at all: nothing to push, nothing fires
    assert(!PlanHygiene.violations(scan.select($"r_name"))
      .contains("unpushed-scan-filter"))
  }
}
