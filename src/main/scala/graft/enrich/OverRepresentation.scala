package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.gfunctions.hypergeom_pvalue

/** Over-representation analysis (ORA): for each annotation set
  * ("pathway"), the hypergeometric upper-tail significance of its
  * overlap with a selected item list — the one-sided Fisher exact test
  * every gene-set enrichment tool runs, and the statistical layer the
  * reference's target-validation stage
  * (`drug_target_gse46602/pipeline2.py:700-760`) stops short of.
  *
  * Scale shape: `membership` (item, set) is the fact-sized input; the
  * selected list joins it once (broadcast — a hit list is small by
  * definition), then everything collapses to one row per SET. The
  * p-value expression evaluates at set grain only. The universe size N
  * and list size n are global 1-row aggregates broadcast via crossJoin,
  * the A14 pattern — no window over the fact table.
  */
object OverRepresentation {

  /** Per-set ORA table: (set, set_size K, n_hits k, p-value, fold
    * enrichment (k/n)/(K/N) at 4 dp). `membership` columns: itemCol,
    * setCol (item may belong to many sets); `selected` is the hit list
    * (distinct itemCol). Items in `selected` but absent from
    * `membership`'s item universe still count toward n (the standard
    * convention when the universe is the membership table's item
    * domain is to intersect first — callers pre-filter; here n counts
    * the selected list as given). p-values at 6 dp.
    */
  def enrich(membership: DataFrame, selected: DataFrame, itemCol: String,
             setCol: String): DataFrame = {
    val m = membership.select(col(itemCol).as("__item"),
      col(setCol).as("__set")).distinct()
    val sel = selected.select(col(itemCol).as("__item")).distinct()
    val universe = m.select(col("__item")).distinct()
      .agg(count(lit(1)).as("big_n"))
    val listSize = sel.agg(count(lit(1)).as("n_draw"))
    val perSet = m.groupBy(col("__set"))
      .agg(count(lit(1)).as("set_size"))
    val hits = m.join(broadcast(sel), Seq("__item"), "left_semi")
      .groupBy(col("__set"))
      .agg(count(lit(1)).as("n_hits"))
    perSet.join(hits, Seq("__set"), "left")
      .na.fill(0L, Seq("n_hits"))
      .crossJoin(broadcast(universe))
      .crossJoin(broadcast(listSize))
      .select(col("__set").as("set_name"), col("set_size"),
        col("n_hits"), col("n_draw"), col("big_n"),
        round(hypergeom_pvalue(col("n_hits"), col("set_size"),
          col("n_draw"), col("big_n")), 6).as("pvalue"),
        round((col("n_hits") * col("big_n")).cast("double") /
          (col("n_draw") * col("set_size")), 4).as("fold_enrichment"))
  }
}
