package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the fuzz generator's contract: seed-determinism (the property
  * that makes any oracle divergence reproducible from the seed alone),
  * schema preservation, key immutability, and that the adversarial
  * shapes it promises (nulls, zeros, ties, hot keys, empty strings,
  * row drops) actually appear. */
class FuzzGenSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("same seed regenerates bit-identical tables; different seeds " +
    "differ") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val a = FuzzGen.perturb("lineitem", li, 7L)
    val b = FuzzGen.perturb("lineitem", li, 7L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val c = FuzzGen.perturb("lineitem", li, 8L)
    assert(c.exceptAll(a).count() > 0)
  }

  test("schema and keys survive; rows drop; adversarial shapes appear") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val f = FuzzGen.perturb("lineitem", li, 7L).cache()
    try {
      assert(f.schema == li.schema)
      assert(f.count() < li.count()) // ~1/37 dropped
      // keys untouched: every fuzzed (orderkey, linenumber) exists in src
      assert(f.select("l_orderkey", "l_linenumber")
        .exceptAll(li.select("l_orderkey", "l_linenumber")).isEmpty)
      val shapes = f.agg(
        sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("nulls"),
        sum(when(col("l_quantity") === 0.0, 1).otherwise(0)).as("zeros"),
        sum(when(col("l_extendedprice") < 0, 1).otherwise(0)).as("negs"),
        sum(when(col("l_returnflag") === "Z", 1).otherwise(0)).as("hot"),
        sum(when(col("l_returnflag").isNull, 1).otherwise(0)).as("nullgrp"))
        .head()
      (0 until 5).foreach(i => assert(shapes.getLong(i) > 0,
        s"shape $i missing"))
      // tie pressure: 1-dp rounding shrinks the distinct-value domain
      assert(f.select("l_quantity").distinct().count() <
        li.select("l_quantity").distinct().count() + 1000)
    } finally f.unpersist()
  }

  test("documents: boilerplate duplicates and unicode appear; text " +
    "perturbation is seed-deterministic") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val f = FuzzGen.perturb("documents", docs, 7L).cache()
    try {
      val boiler = f.filter(col("text").startsWith("the quick brown fox"))
        .count()
      assert(boiler > 1, "boilerplate near-dup group missing")
      assert(f.filter(col("text").contains("世界")).count() > 0)
      val again = FuzzGen.perturb("documents", docs, 7L)
      assert(f.exceptAll(again).isEmpty)
    } finally f.unpersist()
  }

  test("v3 (seeds >= 40): text-shape extremes appear — 1-char astral " +
    "docs, CRLF lines, whitespace-only, NFD accents; v2 seeds see none") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val f = FuzzGen.perturb("documents", docs, 40L).cache()
    try {
      assert(f.filter(col("text") === "🀄").count() > 0,
        "1-char astral doc missing")
      assert(f.filter(col("text") === "x").count() > 0,
        "1-char ascii doc missing")
      assert(f.filter(col("text").contains("\r\n")).count() > 0,
        "CRLF docs missing")
      assert(f.filter(col("text") === "   ").count() > 0,
        "whitespace-only doc missing")
      assert(f.filter(col("text").contains("éclair")).count() > 0,
        "NFD-decomposed accent missing")
      assert(f.filter(col("text").contains("𐍈")).count() > 0,
        "astral suffix missing")
      // v2 seeds never produce v3 shapes (version isolation)
      val v2 = FuzzGen.perturb("documents", docs, 39L)
      assert(v2.filter(col("text") === "🀄" ||
        col("text").contains("\r\n")).count() == 0)
      // free-string v3 shapes on a non-text table
      val cust = spark.read.parquet(s"$sf/customer.parquet")
      val fc = FuzzGen.perturb("customer", cust, 40L)
      assert(fc.filter(col("c_name") === "🀄").count() > 0)
      assert(fc.filter(col("c_name").startsWith("a\r\n")).count() > 0)
    } finally f.unpersist()
  }

  test("v4 (seeds >= 48): Zipf key skew — hot fat key appears on " +
    "events.user_id; v3 seeds keep keys untouched") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val f = FuzzGen.perturb("events", ev, 48L).cache()
    try {
      val n = f.count().toDouble
      val top = f.groupBy("user_id").count()
        .orderBy(col("count").desc).limit(2)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // top key is one of the 8 hot ranks and holds 10-30% of all rows
      // (Zipf α=1.1, 50% hot mass → ≈20%); second hot key follows
      assert(top(0)._1 >= 0L && top(0)._1 < 8L, s"top key ${top(0)}")
      assert(top(0)._2 / n > 0.10 && top(0)._2 / n < 0.30,
        s"top share ${top(0)._2 / n}")
      assert(top(1)._2 / n > 0.03, s"second share ${top(1)._2 / n}")
      // determinism
      val again = FuzzGen.perturb("events", ev, 48L)
      assert(f.exceptAll(again).isEmpty)
      // v3 seeds: keys bit-identical to source (version isolation)
      val v3 = FuzzGen.perturb("events", ev, 47L)
      assert(v3.select("event_id", "user_id")
        .exceptAll(ev.select("event_id", "user_id")).isEmpty)
      // lineitem join keys skew too
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val fl = FuzzGen.perturb("lineitem", li, 48L)
      val topPart = fl.groupBy("l_partkey").count()
        .orderBy(col("count").desc).limit(1).head()
      assert(topPart.getLong(0) < 8L &&
        topPart.getLong(1) > fl.count() / 10)
    } finally f.unpersist()
  }
}
