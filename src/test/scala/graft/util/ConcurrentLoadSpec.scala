package graft.util

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.SparkSuite

/** Concurrent-session shared-state pin (round-14 task 4, the
  * ConcurrentGate's unit-grain companion): Tables.load toggles a
  * SESSION-global legacy conf during schema resolution — unserialized,
  * two threads of one session racing load() could unset it mid-
  * resolution and make Spark refuse the TIMESTAMP(NANOS) footer. The
  * load is now lock-serialized; this spec hammers it from 8 threads
  * and requires every load to resolve the rebuilt micros timestamp. */
class ConcurrentLoadSpec extends SparkSuite {

  test("8 threads loading the nanos-timestamp table concurrently all " +
    "resolve; the conf is restored afterwards") {
    val dir = "/root/testdata/sf0.001"
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key) // registered default: "false"
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(Executors.newFixedThreadPool(8))
    val loads = Future.sequence((1 to 24).map { _ =>
      Future {
        val df = Tables.load(spark, dir, "events")
        // resolution succeeded AND the ts column came back as timestamp
        df.schema("ts").dataType.typeName == "timestamp" &&
          df.limit(1).count() >= 0
      }
    })
    assert(Await.result(loads, 120.seconds).forall(identity))
    assert(spark.conf.getOption(key) == before, "conf leaked")
  }
}
