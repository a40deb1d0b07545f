package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort/retention analytics over an event stream — the standard
  * "of the users who first appeared in week W, how many were still
  * active k weeks later" product-health matrix.
  */
object Cohorts {

  /** Weekly retention matrix: each user is assigned to the cohort of
    * their first-seen ISO week (date_trunc week = Monday start on both
    * Spark and DuckDB); one output row per (cohort_week, week_offset)
    * that had at least one active cohort member.
    *
    * Scale shape: one per-user min aggregate (map-side combined, shuffle
    * ∝ users), one distinct (user, week) projection (shuffle ∝ active
    * user-weeks, not events), a user-keyed join between the two — both
    * sides already hash-partitioned on user — and a final
    * cohort-cardinality aggregate. The event stream itself is scanned
    * twice but never shuffled at event grain. Week offsets are exact
    * (both timestamps week-truncated, so the day difference is a
    * multiple of 7).
    *
    * Output: (cohort_week timestamp, week_offset long, n_cohort,
    * n_active, retention 4 dp); week_offset 0 rows carry the cohort
    * size with retention 1.0 by construction.
    */
  def weeklyRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(userCol).as("__u"))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = events.select(col(userCol).as("__u"),
      date_trunc("week", col(tsCol)).as("__w")).distinct()
    val sizes = firstSeen.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_cohort"))
    active.join(firstSeen, Seq("__u"))
      .groupBy(col("cohort_week"),
        (datediff(col("__w"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_cohort"),
        col("n_active"),
        round(col("n_active") / col("n_cohort").cast("double"), 4)
          .as("retention"))
  }

  /** New-vs-returning daily actives (X84): per bucket, how many active
    * users are seen for the FIRST time vs returning — the growth
    * dashboard's top row, and the decomposition that separates
    * acquisition from engagement in a DAU trend.
    *
    * Scale shape mirrors [[weeklyRetention]]: per-user min aggregate
    * (first-seen), distinct (user, day) actives (shuffle ∝ active
    * user-days, never events), user-keyed join between two frames
    * already partitioned on user, then a day-grain aggregate. All
    * counts exact.
    *
    * Output: (day, n_active, n_new, n_returning, new_share 4-dp). */
  def newVsReturning(events: DataFrame, userCol: String,
                     tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(userCol).as("__u"))
      .agg(to_date(min(col(tsCol))).as("__first"))
    val active = events.select(col(userCol).as("__u"),
      to_date(col(tsCol)).as("day")).distinct()
    active.join(firstSeen, Seq("__u"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("__first"), 1L).otherwise(0L))
          .as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        round(col("n_new") / col("n_active").cast("double"), 4)
          .as("new_share"))
  }

  /** Cohort LTV accumulation matrix: per (acquisition cohort, age) the
    * cumulative revenue per cohort member — the "how much is a
    * customer worth by month/year N" curve that pairs with
    * [[weeklyRetention]]'s activity counts. `valueCents` keeps the
    * accumulation in exact integers (the q210 cents convention); the
    * per-member normalization divides by the FIXED acquisition-cohort
    * size, not the still-active count (LTV convention — churned
    * members dilute, that's the point). Cohort = the key's first
    * `bucket`; age = bucket − cohort. One first-bucket aggregate, one
    * (cohort, age) aggregate, one cumulative window over the
    * cohort×age-bounded matrix. Output: (cohort, age, cohort_size,
    * period_cents, cum_cents, cum_per_member = whole cents per member
    * over 100, i.e. cent-exact dollars).
    */
  def ltvMatrix(df: DataFrame, key: String, bucket: String,
                valueCents: String): DataFrame = {
    val firsts = df.groupBy(col(key).as("__k"))
      .agg(min(col(bucket)).as("cohort"))
    val sizes = firsts.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    val cells = df
      .join(firsts, col(key) === col("__k"))
      .groupBy(col("cohort"), (col(bucket) - col("cohort")).as("age"))
      .agg(sum(col(valueCents)).as("period_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort")).orderBy(col("age"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cells
      .withColumn("cum_cents", sum(col("period_cents")).over(w))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("age"), col("cohort_size"),
        col("period_cents"), col("cum_cents"),
        // per-member value rounds IN CENTS first, then scales: the
        // one-step round(cents/(size*100), 2) lands on a .xx5 decimal
        // whenever cents/size has remainder .5, and that decimal is
        // not binary-representable, so the engines' 2-dp rounds could
        // disagree by a cent (fuzz-24, the q6 midpoint class); the
        // half-cent case itself IS exact in binary, so round-to-int
        // agrees everywhere and int/100.0 is the same double on both
        (round(col("cum_cents").cast("double") / col("cohort_size"))
          / lit(100.0)).as("cum_per_member"))
  }
}
