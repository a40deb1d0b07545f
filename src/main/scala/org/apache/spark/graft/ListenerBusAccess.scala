package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the catalog
  * inventory's eager/lazy classification needs a DETERMINISTIC "all
  * job-start events delivered" barrier (a sleep-poll would make the
  * classification spec flaky). This is the one sanctioned way in:
  * a forwarder inside the org.apache.spark package tree, like the
  * custom Catalyst expressions in org.apache.spark.sql.graft. */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
