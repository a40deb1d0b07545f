package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern primitives over an event stream — the "A then B"
  * questions behind funnel design and next-action modeling, kept at
  * the two shapes that stay cheap at fact scale:
  *
  *  - [[pairSupport]]: for every ordered pair of event types, how many
  *    users did A strictly before B — computed from the per-(user,
  *    type) first/last timestamps, so the pairing joins a frame of
  *    |users| × |types| rows (type-domain-bounded), never the events.
  *  - [[transitionEntropy]]: per state, the Shannon entropy of the
  *    next-state distribution plus the transition-share-weighted
  *    entropy rate — "how predictable is the next action from the
  *    current one". Transitions come from one lead() window at event
  *    grain; everything after is state-domain-bounded.
  */
object SeqPatterns {

  /** Ordered-pair support: (type_a, type_b, n_users_seq, n_users_both,
    * support 4dp = n_users_seq / n_users_both), a ≠ b, sorted. A user
    * counts for (a, b) when their FIRST a-event is strictly before
    * their LAST b-event — the standard "a happened, then b happened
    * (at least once) after it" reading (min_a < max_b). */
  def pairSupport(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String): DataFrame = {
    val spans = events.groupBy(col(userCol).as("__u"),
        col(typeCol).as("__t"))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
    val a = spans.select(col("__u"), col("__t").as("type_a"),
      col("__first").as("__fa"))
    val b = spans.select(col("__u"), col("__t").as("type_b"),
      col("__last").as("__lb"))
    a.join(b, Seq("__u"))
      .filter(col("type_a") =!= col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(when(col("__fa") < col("__lb"), 1)).as("n_users_seq"),
        count(lit(1)).as("n_users_both"))
      .withColumn("support", round(
        col("n_users_seq").cast("double") / col("n_users_both"), 4))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Per-state next-state entropy + overall entropy rate:
    * (state, n_trans BIGINT, entropy 4dp, share 4dp, entropy_rate 4dp
    * — the same rate value on every row, Σ share·entropy). Transitions
    * are consecutive same-user events ordered by (ts, tie); entropy
    * uses the exact-count identity H = ln n − (Σ c·ln c)/n (the
    * InfoTheory discipline). */
  def transitionEntropy(events: DataFrame, userCol: String,
                        typeCol: String, tsCol: String,
                        tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val trans = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("state"), col("__next"))
      .agg(count(lit(1)).as("c"))
    val perState = trans.groupBy(col("state"))
      .agg(sum(col("c")).as("n_trans"),
        sum(col("c") * log(col("c").cast("double"))).as("__clc"))
      .withColumn("__h", log(col("n_trans").cast("double")) -
        col("__clc") / col("n_trans"))
    val wAll = Window.partitionBy(lit(1))
    perState
      .withColumn("share", col("n_trans").cast("double") /
        sum(col("n_trans")).over(wAll))
      .withColumn("entropy_rate", round(
        sum(col("__h") * col("n_trans")).over(wAll) /
          sum(col("n_trans")).over(wAll), 4))
      .select(col("state"), col("n_trans"),
        round(col("__h"), 4).as("entropy"),
        round(col("share"), 4).as("share"), col("entropy_rate"))
      .orderBy(col("state"))
  }
}
