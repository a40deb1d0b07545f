package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.join.{AsOfJoin, RangeJoin}

/** Marketing-attribution over an event log: credit each conversion to
  * the touch event that "caused" it under a last-touch model — the
  * latest qualifying touch at-or-before the conversion, within a
  * lookback horizon. Conversions with no touch in the horizon are
  * reported as `unattributed` (they are a key health metric, not a row
  * to drop).
  *
  * This is deliberately a COMPOSITION, not a new join: last-touch IS
  * the backward as-of join with tolerance ([[graft.join.AsOfJoin]]),
  * keyed by user, tie-broken on the touch id so simultaneous touches
  * resolve deterministically. First-touch would be the forward as-of
  * from the horizon start; multi-touch models (linear, time-decay)
  * would be the range join ([[graft.join.RangeJoin]]) plus a weight
  * aggregate. One shuffle on the user key, carried by the as-of's
  * union+window plan — no per-conversion scan of the touch history.
  */
object Attribution {

  /** Conversions per last-touch channel. `touchTypes` enumerates the
    * attributable event types; `conversionType` rows are the credit
    * targets; `lookbackSec` bounds how old a touch may be. Output:
    * (touch, conversions BIGINT) with `unattributed` for horizon
    * misses, ordered by touch. */
  def lastTouch(events: DataFrame, user: String, ts: String,
                eventType: String, id: String,
                conversionType: String, touchTypes: Seq[String],
                lookbackSec: Long): DataFrame = {
    val conv = events.filter(col(eventType) === conversionType)
      .select(col(user), col(ts), col(id))
    val touches = events.filter(col(eventType).isin(touchTypes: _*))
      .select(col(user), col(ts), col(id).as("__touch_id"),
        col(eventType).as("touch"))
    AsOfJoin.asOfBackward(conv, touches, user, ts, Seq("touch"),
        rightTieBreak = Some("__touch_id"),
        toleranceSec = Some(lookbackSec))
      .groupBy(coalesce(col("touch"), lit("unattributed")).as("touch"))
      .agg(count(lit(1)).as("conversions"))
      .orderBy(col("touch"))
  }

  /** Multi-touch LINEAR attribution — the [[lastTouch]] docstring's
    * promised sibling: every touch inside the lookback shares the
    * conversion's credit equally (1/k to each of k touches). This IS
    * the banded range join ([[graft.join.RangeJoin]]) — each
    * conversion opens the interval [ts − lookback, ts] (inclusive at
    * the conversion instant, matching lastTouch's tolerance bound) and
    * collects its in-window touches; weights are one window count over
    * the candidate-proportional join output, never the event stream.
    * Conversions with no touch report as `unattributed` with full
    * credit 1 each — the same health metric lastTouch keeps.
    * Output: (touch, credit rounded 4dp, n_touches BIGINT), ordered. */
  def linear(events: DataFrame, user: String, ts: String,
             eventType: String, id: String,
             conversionType: String, touchTypes: Seq[String],
             lookbackSec: Long): DataFrame = {
    val conv = events.filter(col(eventType) === conversionType)
      .select(col(user), col(id).as("__conv_id"),
        (col(ts) - expr(s"INTERVAL $lookbackSec SECONDS")).as("__ws"),
        (col(ts) + expr("INTERVAL 1 MICROSECOND")).as("__we"))
    val touches = events.filter(col(eventType).isin(touchTypes: _*))
      .select(col(user), col(ts), col(eventType).as("touch"))
    val joined = RangeJoin.bandedIntervalJoin(conv, touches, user,
      "__ws", "__we", ts, bandWidthSec = lookbackSec)
    val weighted = joined.withColumn("__wt",
      lit(1.0) / count(lit(1)).over(Window.partitionBy(col("__conv_id"))))
    val credited = weighted.groupBy(col("touch"))
      .agg(round(sum(col("__wt")), 4).as("credit"),
        count(lit(1)).as("n_touches"))
    val unattributed = conv
      .join(joined.select(col("__conv_id")).distinct(),
        Seq("__conv_id"), "left_anti")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 0)
      .select(lit("unattributed").as("touch"),
        round(col("__n").cast("double"), 4).as("credit"),
        lit(0L).as("n_touches"))
    credited.unionByName(unattributed).orderBy(col("touch"))
  }

  /** Position-based (U-shaped) multi-touch attribution — the third
    * classic next to [[lastTouch]] and [[linear]]: the FIRST touch in
    * the lookback gets `firstW` (default 40%), the LAST gets `lastW`
    * (40%), and the middles share the remainder equally. Journeys of
    * one touch take full credit; of two, first/last split
    * proportionally (50/50 at the defaults). Same banded range join
    * as [[linear]] plus one ordered window per conversion (ties on
    * timestamp broken by the touch event id — deterministic).
    * Output: (touch, credit 4dp, n_touches BIGINT) +
    * `unattributed`. */
  def positionBased(events: DataFrame, user: String, ts: String,
                    eventType: String, id: String,
                    conversionType: String, touchTypes: Seq[String],
                    lookbackSec: Long, firstW: Double = 0.4,
                    lastW: Double = 0.4): DataFrame = {
    require(firstW > 0 && lastW > 0 && firstW + lastW <= 1,
      "firstW/lastW must be positive and sum to <= 1")
    val conv = events.filter(col(eventType) === conversionType)
      .select(col(user), col(id).as("__conv_id"),
        (col(ts) - expr(s"INTERVAL $lookbackSec SECONDS")).as("__ws"),
        (col(ts) + expr("INTERVAL 1 MICROSECOND")).as("__we"))
    val touches = events.filter(col(eventType).isin(touchTypes: _*))
      .select(col(user), col(ts), col(id).as("__touch_id"),
        col(eventType).as("touch"))
    val joined = RangeJoin.bandedIntervalJoin(conv, touches, user,
      "__ws", "__we", ts, bandWidthSec = lookbackSec)
    val wConv = Window.partitionBy(col("__conv_id"))
    val wOrd = Window.partitionBy(col("__conv_id"))
      .orderBy(col(ts), col("__touch_id"))
    val midW = 1.0 - firstW - lastW
    val ranked = joined
      .withColumn("__k", count(lit(1)).over(wConv))
      .withColumn("__r", row_number().over(wOrd))
    val wt = when(col("__k") === 1, lit(1.0))
      .when(col("__k") === 2,
        when(col("__r") === 1, lit(firstW / (firstW + lastW)))
          .otherwise(lit(lastW / (firstW + lastW))))
      .otherwise(
        when(col("__r") === 1, lit(firstW))
          .when(col("__r") === col("__k"), lit(lastW))
          .otherwise(lit(midW) / (col("__k") - 2)))
    val credited = ranked.withColumn("__wt", wt)
      .groupBy(col("touch"))
      .agg(round(sum(col("__wt")), 4).as("credit"),
        count(lit(1)).as("n_touches"))
    val unattributed = conv
      .join(joined.select(col("__conv_id")).distinct(),
        Seq("__conv_id"), "left_anti")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 0)
      .select(lit("unattributed").as("touch"),
        round(col("__n").cast("double"), 4).as("credit"),
        lit(0L).as("n_touches"))
    credited.unionByName(unattributed).orderBy(col("touch"))
  }
}
