package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-lifecycle operators over canonical URLs — the snapshot-to-
  * snapshot bookkeeping of a web corpus (which pages appeared, vanished
  * or changed between two crawls) and the per-site politeness budget
  * that decides what the NEXT crawl fetches. Together with
  * [[graft.text.UrlOps]] (canonicalization, eTLD+1, robots rules) this
  * closes the crawl loop: canonicalize → dedup → delta → budget.
  *
  * Scale shape: crawlDelta is ONE full-outer join co-partitioned on the
  * canonical-URL key (both snapshots shuffle once; no broadcast — both
  * sides are corpus-sized); the rollups are plain hash aggregates on
  * low-cardinality site keys. crawlBudget's total is a one-row
  * broadcast. Every emitted ratio is integer-exact (half-up in integer
  * space, one IEEE division — the round-15 exact-accumulation
  * discipline), so cross-engine parity cannot hinge on float-sum order.
  */
object Crawl {

  /** Cross-snapshot crawl delta (CDC at canonical-URL grain): full
    * outer join of two (url, contentHash) snapshots. Output one row
    * per URL seen in either snapshot: (url, status) with status in
    * {new, gone, changed, unchanged}. NULL hashes are treated as
    * distinct-from-everything (a fetch error is a change), except
    * NULL == NULL which compares unchanged (`<=>`). URLs are expected
    * pre-canonicalized ([[graft.text.UrlOps.canonicalizeUrl]]) and
    * unique per snapshot (crawl frontiers key on canonical URL). */
  def crawlDelta(a: DataFrame, b: DataFrame, urlCol: String,
                 hashCol: String): DataFrame = {
    val l = a.select(col(urlCol).as("url"), col(hashCol).as("__ha"),
      lit(1).as("__ina"))
    val r = b.select(col(urlCol).as("url"), col(hashCol).as("__hb"),
      lit(1).as("__inb"))
    l.join(r, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("__ina").isNull, lit("new"))
          .when(col("__inb").isNull, lit("gone"))
          .when(col("__ha") <=> col("__hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Host-grain rollup of [[crawlDelta]]: per `hostExpr` (typically
    * `UrlOps.urlHost(col("url"))` or a registrable-domain column) the
    * four status counts plus churn = (new + gone + changed) / total,
    * emitted at 4 dp via integer half-up (exact on both engines). */
  def deltaByHost(delta: DataFrame, hostExpr: Column): DataFrame =
    delta.groupBy(hostExpr.as("host"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "gone", 1L).otherwise(0L)).as("n_gone"),
        sum(when(col("status") === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"),
        count(lit(1)).as("n_urls"))
      .withColumn("churn",
        expr("(2*(n_new + n_gone + n_changed)*10000 + n_urls) " +
          "div (2*n_urls)") / 1e4)

  /** Per-site politeness/crawl-budget allocation over robots-style
    * allow decisions ([[graft.text.UrlOps.applyPathRules]] output):
    * per `siteCol` — n_urls, n_allowed, allow_rate (4 dp, integer
    * half-up), and budget = min(perSiteCap, floor(n_allowed ·
    * totalBudget / Σ n_allowed)) — proportional fair-share in exact
    * integer arithmetic (the floor under-allocates by < one fetch per
    * site rather than ever over-committing the crawler). A site with
    * zero allowed URLs gets budget 0; an all-blocked corpus (total 0)
    * allocates 0 everywhere — guarded by an explicit total-positive
    * branch, NOT by coalesce(least(cap, null)): both engines' `least`
    * SKIPS nulls, so that spelling silently hands every site the cap
    * (caught by CrawlSpec's all-blocked case). The nullif keeps the
    * division ANSI-safe besides. */
  def crawlBudget(decisions: DataFrame, siteCol: String,
                  allowedCol: String, totalBudget: Long,
                  perSiteCap: Long): DataFrame = {
    require(totalBudget >= 0 && perSiteCap >= 0,
      "totalBudget and perSiteCap must be non-negative")
    val per = decisions.groupBy(col(siteCol).as("site"))
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col(allowedCol), 1L).otherwise(0L)).as("n_allowed"))
    val tot = per.agg(sum(col("n_allowed")).as("__tot"))
    per.crossJoin(broadcast(tot))
      .select(col("site"), col("n_urls"), col("n_allowed"),
        (expr("(2*n_allowed*10000 + n_urls) div (2*n_urls)") / 1e4)
          .as("allow_rate"),
        when(col("__tot") > 0,
          least(lit(perSiteCap),
            expr(s"(n_allowed * $totalBudget) div nullif(__tot, 0)")))
          .otherwise(lit(0L)).as("budget"))
  }
}
