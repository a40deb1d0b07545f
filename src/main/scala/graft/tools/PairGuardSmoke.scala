package graft.tools

import org.apache.spark.sql.SparkSession

import graft.dedup.Dedup

/** Round-12 task-4 completion proof: the sf10 slice carries ~100-way
  * near-verbatim duplication per original document, and the UNGUARDED
  * pair enumerators owe Ω(dupGroup²) output there — the round-11 run
  * ENOSPC'd at ~25M owed pairs. This main runs the same pair queries
  * WITH the `maxPairsPerId` guard on a directory and prints wall time
  * + output size, proving a correct-but-truncated answer completes
  * where the contractual answer exhausted the machine.
  *
  * Usage: `sbt 'runMain graft.tools.PairGuardSmoke [dir] [cap]'`
  * (defaults tmp/sf10, 20).
  */
object PairGuardSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/sf10")
    val cap = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"pair-guard smoke on $dir (${docs.count()} docs), " +
      s"maxPairsPerId=$cap")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: $n pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timed("ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        minJaccard = 0.5, maxPairsPerId = cap).count()
    }
    timed("minhashLshPairs") {
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        minJaccard = 0.5, maxPairsPerId = cap).count()
    }
    timed("containmentPairs") {
      Dedup.containmentPairs(docs, "doc_id", "text",
        minContainment = 0.8, maxPairsPerId = cap).count()
    }
    spark.stop()
  }
}
