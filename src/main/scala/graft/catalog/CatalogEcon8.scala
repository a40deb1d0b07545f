package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch M (X101+): scoring-
  * model evaluation — PR curve / average precision, decile lift,
  * calibration reliability with ECE, Brier decomposition. All four
  * share one deterministic scored-outcome construction: label =
  * order fulfilled, score = md5-uniform noise blended 60/40 with the
  * label and snapped to a 3-dp grid (both engines build the identical
  * scores, and the grid bounds every distinct-score domain).
  */
object CatalogEcon8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Mask = (1L << 47) - 1

  private def scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.gfunctions.md5_long
    t(s, dir, "orders").select($"o_orderkey",
      when($"o_orderstatus" === "F", 1L).otherwise(0L).as("y"),
      round((md5_long($"o_custkey".cast("string"))
        .bitwiseAND(lit(Mask)).cast("double") / Mask) * 0.6 +
        when($"o_orderstatus" === "F", 0.4).otherwise(0.0), 3)
        .as("score"))
  }

  private val scoredSql =
    """sc AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END::BIGINT AS y,
      |    round(((md5_number_lower(CAST(o_custkey AS VARCHAR))
      |            & 140737488355327)::DOUBLE / 140737488355327) * 0.6
      |          + CASE WHEN o_orderstatus = 'F' THEN 0.4 ELSE 0.0 END,
      |          3) AS score
      |  FROM orders)""".stripMargin

  /** X101: precision–recall curve + average precision
    * ([[graft.ml.Ranking.prCurve]]) — cumulative windows over the
    * 3-dp-bounded DISTINCT score domain, AP as the step integral. */
  private val q211 = Q("q211_pr_curve",
    (s, dir) => {
      import s.implicits._
      graft.ml.Ranking.prCurve(scored(s, dir), "y", "score")
        .orderBy($"threshold".desc)
    },
    Some("WITH " + scoredSql +
      """,
        |g AS (SELECT score AS threshold, count(*)::BIGINT AS n_at,
        |        sum(y)::BIGINT AS np_at
        |      FROM sc GROUP BY 1),
        |c AS (SELECT threshold, n_at, np_at,
        |        sum(n_at) OVER wd AS n_pred,
        |        sum(np_at) OVER wd AS tp,
        |        sum(np_at) OVER () AS pos
        |      FROM g
        |      WINDOW wd AS (ORDER BY threshold DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |pr AS (SELECT threshold, n_pred, tp,
        |         tp::DOUBLE / n_pred AS prec,
        |         tp::DOUBLE / nullif(pos, 0) AS rec,
        |         coalesce(lag(tp::DOUBLE / nullif(pos, 0), 1)
        |           OVER (ORDER BY threshold DESC), 0.0) AS prev_rec
        |       FROM c)
        |SELECT threshold, n_pred::BIGINT AS n_pred, tp::BIGINT AS tp,
        |  round(prec, 4) AS "precision", round(rec, 4) AS recall,
        |  round(sum((rec - prev_rec) * prec) OVER (), 4)
        |    AS avg_precision
        |FROM pr ORDER BY threshold DESC""".stripMargin))

  /** X102: decile gains/lift table ([[graft.ml.Ranking.liftTable]]) —
    * floor-arithmetic equal-count bins (no ntile ambiguity), cumulative
    * capture and lift against the base rate. */
  private val q212 = Q("q212_lift_table",
    (s, dir) => {
      import s.implicits._
      graft.ml.Ranking.liftTable(scored(s, dir), "y", "score",
          tieBreak = "o_orderkey", nBins = 10)
        .orderBy($"bin")
    },
    Some("WITH " + scoredSql +
      """,
        |r AS (SELECT y,
        |        row_number() OVER (ORDER BY score DESC, o_orderkey)
        |          AS rk,
        |        count(*) OVER () AS n
        |      FROM sc),
        |b AS (SELECT (floor((rk - 1) * 10.0 / n) + 1)::BIGINT AS bin, y
        |      FROM r),
        |g AS (SELECT bin, count(*)::BIGINT AS n_rows,
        |        sum(y)::BIGINT AS n_pos
        |      FROM b GROUP BY 1),
        |c AS (SELECT bin, n_rows, n_pos,
        |        sum(n_pos) OVER wc AS cum_pos,
        |        sum(n_rows) OVER wc AS cum_n,
        |        sum(n_pos) OVER () AS tot_pos,
        |        sum(n_rows) OVER () AS tot_n
        |      FROM g
        |      WINDOW wc AS (ORDER BY bin
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT bin, n_rows, n_pos,
        |  round(n_pos::DOUBLE / n_rows, 4) AS bin_rate,
        |  cum_pos::BIGINT AS cum_pos,
        |  round(cum_pos::DOUBLE / nullif(tot_pos, 0), 4)
        |    AS cum_capture,
        |  round((cum_pos::DOUBLE / cum_n) /
        |        nullif(tot_pos::DOUBLE / tot_n, 0.0), 4) AS cum_lift
        |FROM c ORDER BY bin""".stripMargin))

  /** X103: calibration reliability table + expected calibration error
    * ([[graft.ml.Calibration.reliability]]) — floor(p·10) bins on the
    * 3-dp probability grid, bin membership engine-exact. */
  private val q213 = Q("q213_reliability",
    (s, dir) => {
      import s.implicits._
      graft.ml.Calibration.reliability(scored(s, dir), "y", "score",
          nBins = 10)
        .orderBy($"bin")
    },
    Some("WITH " + scoredSql +
      """,
        |b AS (SELECT least(9, floor(score * 10))::BIGINT AS bin, y,
        |        score
        |      FROM sc),
        |g AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
        |        sum(score) AS sump
        |      FROM b GROUP BY 1),
        |w AS (SELECT bin, n, n_pos, sump / n AS mean_p,
        |        n_pos::DOUBLE / n AS frac_pos,
        |        abs(n_pos::DOUBLE / n - sump / n) AS gap,
        |        sum(n) OVER () AS tot
        |      FROM g)
        |SELECT bin, n, n_pos, round(mean_p, 4) AS mean_p,
        |  round(frac_pos, 4) AS frac_pos, round(gap, 4) AS gap,
        |  round(sum(n * gap) OVER () / max(tot) OVER (), 4) AS ece
        |FROM w ORDER BY bin""".stripMargin))

  /** X104: Brier score with the Murphy decomposition
    * ([[graft.ml.Calibration.brierDecomposition]]) — reliability,
    * resolution, uncertainty from the same bins. */
  private val q214 = Q("q214_brier",
    (s, dir) => {
      graft.ml.Calibration.brierDecomposition(scored(s, dir), "y",
        "score", nBins = 10)
    },
    Some("WITH " + scoredSql +
      """,
        |b AS (SELECT least(9, floor(score * 10))::BIGINT AS bin, y,
        |        score
        |      FROM sc),
        |g AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos,
        |        sum(score) AS sump
        |      FROM b GROUP BY 1),
        |tt AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS allpos,
        |         sum((score - y) * (score - y)) AS sqerr
        |       FROM b),
        |terms AS (SELECT max(tt.n) AS n,
        |    sum(g.n * (g.sump / g.n - g.pos::DOUBLE / g.n) *
        |              (g.sump / g.n - g.pos::DOUBLE / g.n)) AS rel,
        |    sum(g.n * (g.pos::DOUBLE / g.n
        |               - tt.allpos::DOUBLE / tt.n) *
        |              (g.pos::DOUBLE / g.n
        |               - tt.allpos::DOUBLE / tt.n)) AS res,
        |    max(tt.sqerr) AS sq,
        |    max(tt.allpos::DOUBLE / tt.n) AS base
        |  FROM g, tt)
        |SELECT n, round(sq / n, 4) AS brier,
        |  round(rel / n, 4) AS reliability,
        |  round(res / n, 4) AS resolution,
        |  round(base * (1.0 - base), 4) AS uncertainty
        |FROM terms""".stripMargin))

  val all: Seq[Q] = Seq(q211, q212, q213, q214)
}
