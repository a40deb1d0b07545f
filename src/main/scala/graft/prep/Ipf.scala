package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative proportional fitting (raking): rescale a two-way cell
  * table's weights until its row and column margins match given
  * targets — the survey-calibration / table-balancing standard
  * (Deming–Stephan 1940).
  *
  * IPF factorizes: the fitted weight is always seed_rc · a_r · b_c, so
  * the ITERATION only ever needs the margin-factor vectors — which are
  * category-domain-bounded — never the cell table. The implementation
  * aggregates the cells to the (row, col) grain once, collects that
  * domain-bounded matrix to the driver (guarded by `maxCells`, the
  * betweenness-guard discipline: a fact-grain misuse fails with a
  * message, not an OOM), runs the scaling loop in memory, and applies
  * the final factors back with one broadcast join — the input cell
  * frame itself is streamed through exactly twice (aggregate + apply)
  * no matter how many iterations run.
  *
  * An earlier all-DataFrame loop is a documented anti-pattern: each
  * `localCheckpoint` PRESERVES the origin plan's computed statistics,
  * so every iteration's pair of joins SQUARES the `sizeInBytes` BigInt
  * estimate — after ~10 rounds the planner grinds million-bit
  * BigInteger multiplications and the job never gets to run. Driver
  * iteration over the domain-bounded factors sidesteps the whole
  * class.
  *
  * Deterministic: no randomness, and the scaling chain is the same
  * float sequence on every run. Inherently iterative, so it carries
  * unit coverage with pinned convergence rather than a DuckDB oracle —
  * the streaming-twin precedent.
  */
object Ipf {

  /** `cells`: (rowCol, colCol, weight); `rowTargets`: (rowCol, target);
    * `colTargets`: (colCol, target). Margins of the targets must agree
    * in total (checked). Output: one row per input (rowCol, colCol)
    * cell — (rowCol, colCol, weight 6dp) plus the convergence columns
    * (iters INT, max_rel_err 6dp) repeated per row; max_rel_err is the
    * worst relative ROW-margin error (columns are exact after the
    * final column scaling). */
  def rake(cells: DataFrame, rowCol: String, colCol: String,
           weightCol: String, rowTargets: DataFrame,
           colTargets: DataFrame, iters: Int = 20,
           maxCells: Long = 2000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = cells.sparkSession
    import spark.implicits._
    val rt = rowTargets.select(col(rowCol).cast("string"),
      col("target").cast("double")).as[(String, Double)].collect().toMap
    val ct = colTargets.select(col(colCol).cast("string"),
      col("target").cast("double")).as[(String, Double)].collect().toMap
    val sumR = rt.values.sum
    val sumC = ct.values.sum
    require(math.abs(sumR - sumC) <= 1e-9 * math.max(1.0, sumR),
      s"row/column target totals must agree, got $sumR vs $sumC")
    val grain = cells.groupBy(col(rowCol).cast("string").as("__r"),
        col(colCol).cast("string").as("__c"))
      .agg(sum(col(weightCol).cast("double")).as("__w"))
    val nCells = grain.count()
    require(nCells <= maxCells,
      s"rake cell domain has $nCells cells — above maxCells " +
        s"($maxCells); the cell table must be category-domain-bounded" +
        " (aggregate the facts to the (row, col) grain first)")
    val seed = grain.as[(String, String, Double)].collect()
    val missR = seed.collect {
      case (r, _, _) if !rt.contains(r) => r
    }.distinct
    val missC = seed.collect {
      case (_, c, _) if !ct.contains(c) => c
    }.distinct
    require(missR.isEmpty && missC.isEmpty,
      "every cell category needs a target; missing rows=" +
        s"${missR.take(5).mkString(",")} cols=" +
        s"${missC.take(5).mkString(",")}")
    // Margin-factor iteration over domain-bounded vectors: w_rc =
    // seed_rc * a_r * b_c throughout; each half-step rescales one
    // factor family to hit its margin exactly.
    val a = scala.collection.mutable.Map(
      rt.keys.map(_ -> 1.0).toSeq: _*)
    val b = scala.collection.mutable.Map(
      ct.keys.map(_ -> 1.0).toSeq: _*)
    var it = 0
    while (it < iters) {
      val rowSums = scala.collection.mutable.Map[String, Double]()
        .withDefaultValue(0.0)
      seed.foreach { case (r, c, w) =>
        rowSums(r) += w * a(r) * b(c)
      }
      rt.foreach { case (r, t) =>
        val s = rowSums(r)
        if (s != 0.0) a(r) = a(r) * t / s
      }
      val colSums = scala.collection.mutable.Map[String, Double]()
        .withDefaultValue(0.0)
      seed.foreach { case (r, c, w) =>
        colSums(c) += w * a(r) * b(c)
      }
      ct.foreach { case (c, t) =>
        val s = colSums(c)
        if (s != 0.0) b(c) = b(c) * t / s
      }
      it += 1
    }
    val finalRow = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(0.0)
    seed.foreach { case (r, c, w) =>
      finalRow(r) += w * a(r) * b(c)
    }
    val err = rt.collect {
      case (r, t) if t != 0.0 => math.abs(finalRow(r) - t) / t
    }.foldLeft(0.0)(math.max)
    val factors = broadcast(
      seed.map { case (r, c, w) => (r, c, a(r) * b(c)) }
        .toSeq.toDF("__r", "__c", "__f"))
    cells
      .join(factors, col(rowCol).cast("string") === col("__r") &&
        col(colCol).cast("string") === col("__c"))
      .select(col(rowCol), col(colCol),
        round(col(weightCol).cast("double") * col("__f"), 6)
          .as("weight"))
      .withColumn("iters", lit(iters))
      .withColumn("max_rel_err", round(lit(err), 6))
  }
}
