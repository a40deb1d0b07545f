package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver test tables (TESTDATA.md).
  *
  * The driver writes `events.ts` as parquet TIMESTAMP(NANOS) (pandas
  * default), which Spark 4 refuses outright. We read nanos as a plain
  * long (legacy conf) and rebuild a micros timestamp with integer
  * division — the same ns->us truncation DuckDB applies when it reads
  * the file, so both engines see identical timestamps. Integer `div`
  * (not `/`) matters: nanos ~1.7e18 exceed double precision.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    // SQLConf is SESSION-global: the set/restore window below is a race
    // when two threads of one session load tables concurrently (thread
    // B's restore can unset the conf mid-resolution of thread A's read,
    // which Spark 4 then refuses). The toggle only covers driver-side
    // schema resolution — milliseconds of metadata work — so one global
    // lock serializes it without serializing any execution
    // (ConcurrentGateSpec pins the concurrent-load path).
    synchronized { loadLocked(spark, dir, name) }

  private def loadLocked(spark: SparkSession, dir: String,
                         name: String): DataFrame = {
    // The legacy conf is needed only while the parquet footer schema is
    // resolved into the plan; restore the caller's setting afterwards so
    // loading a test table doesn't permanently change how the session
    // reads TIMESTAMP(NANOS) parquet elsewhere.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
        case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case None => df
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
