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
}
