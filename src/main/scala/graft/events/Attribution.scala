package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.join.AsOfJoin

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
}
