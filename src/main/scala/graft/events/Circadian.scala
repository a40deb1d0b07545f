package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Circular (directional) statistics over time-of-day — the correct way
  * to ask "when does this event type peak": an arithmetic mean of hours
  * puts the peak of a 23:00/01:00 distribution at noon; the circular
  * mean puts it at midnight. Each timestamp becomes an angle
  * θ = 2π·(seconds into the day)/86400; the resultant vector
  * (avg cos θ, avg sin θ) gives the mean direction (peak time) and its
  * length R̄ the concentration (R̄→1 sharply peaked, →0 uniform over
  * the day). Fisher (1993) summary battery: circular variance 1−R̄ and
  * circular std √(−2 ln R̄).
  *
  * One conditional aggregate over the event grain — two trig terms per
  * row, fully codegen'd, map-side combinable; no window, no shuffle
  * beyond the group-by.
  */
object Circadian {

  /** Per-group time-of-day battery: (group, n BIGINT, r_bar 4dp,
    * peak_hour 4dp in [0, 24), circ_variance 4dp, circ_std 4dp).
    * Sub-second precision is truncated (integer seconds) so every
    * engine extracts the identical angle. Degenerate R̄ = 0 yields
    * null peak/std. */
  def timeOfDayStats(df: DataFrame, groupCol: String,
                     tsCol: String): DataFrame = {
    val secs = (hour(col(tsCol)) * 3600 + minute(col(tsCol)) * 60 +
      second(col(tsCol))).cast("double")
    val theta = secs * (2.0 * math.Pi / 86400.0)
    val a = df.filter(col(tsCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        avg(cos(theta)).as("__c"), avg(sin(theta)).as("__s"))
    val r = sqrt(col("__c") * col("__c") + col("__s") * col("__s"))
    // atan2 ∈ (−π, π]; fold into [0, 2π) then scale to hours.
    val dir = atan2(col("__s"), col("__c"))
    val dirPos = when(dir < 0, dir + 2.0 * math.Pi).otherwise(dir)
    // Degenerate (uniform) direction: R̄ lands at float-sum fuzz
    // (~1e-17), never exact 0 — threshold at 1e-12 so both engines
    // classify a genuinely uniform group identically.
    val ok = r > 1e-12
    a.select(col(groupCol), col("n"),
      round(r, 4).as("r_bar"),
      when(ok,
        round(dirPos * (24.0 / (2.0 * math.Pi)), 4)).as("peak_hour"),
      round(lit(1.0) - r, 4).as("circ_variance"),
      when(ok, round(sqrt(lit(-2.0) * log(r)), 4)).as("circ_std"))
  }
}
