package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch I (X86+): HLL
  * sketching, MERGE/upsert, incremental aggregate maintenance,
  * readability scoring, argmax batteries, higher-order array coverage.
  * Conventions follow Catalog.scala.
  */
object CatalogEcon4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X86: HyperLogLog distinct orderkeys per returnflag
    * ([[graft.sketch.Sketches.hllDistinct]]) — registers bit-identical
    * cross-engine (md5 hash, low-bit index, trailing-zero ρ via the
    * branch-free bit_count identity); the oracle rebuilds every
    * register and replays the α_m·m²/Σ2^(−M) estimator with the same
    * linear-counting branch. */
  private val q189 = Q("q189_hll_distinct",
    (s, dir) => {
      import s.implicits._
      graft.sketch.Sketches.hllDistinct(
          t(s, dir, "lineitem"), "l_returnflag", "l_orderkey")
        .withColumnRenamed("grp", "l_returnflag")
        .orderBy($"l_returnflag")
    },
    Some("""WITH dh AS (SELECT DISTINCT l_returnflag AS grp,
           |    md5_number_lower(CAST(l_orderkey AS VARCHAR)) AS hu
           |  FROM lineitem),
           |rh AS (SELECT grp, (hu & 255)::BIGINT AS idx,
           |    (hu >> 8)::BIGINT AS w
           |  FROM dh),
           |rr AS (SELECT grp, idx,
           |    CASE WHEN w = 0 THEN 57
           |         ELSE bit_count((w & -w) - 1) + 1 END AS rho
           |  FROM rh),
           |regs AS (SELECT grp, idx, max(rho) AS mj,
           |           count(*)::BIGINT AS dv
           |         FROM rr GROUP BY 1, 2),
           |ag AS (SELECT grp, count(*)::BIGINT AS n_registers_set,
           |         sum(pow(2.0, -mj)) AS hsum,
           |         sum(dv)::BIGINT AS exact_distinct
           |       FROM regs GROUP BY 1),
           |sc AS (SELECT grp, exact_distinct, n_registers_set,
           |         (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 /
           |           (hsum + (256.0 - n_registers_set)) AS raw_e,
           |         256.0 - n_registers_set AS zeros
           |       FROM ag)
           |SELECT grp AS l_returnflag, exact_distinct, n_registers_set,
           |  round(CASE WHEN raw_e <= 2.5 * 256 AND zeros > 0
           |             THEN 256.0 * ln(256.0 / zeros)
           |             ELSE raw_e END, 4) AS hll_est
           |FROM sc ORDER BY l_returnflag""".stripMargin))

  /** X87: MERGE / upsert ([[graft.util.Merge.mergeInto]]) — a
    * "corrections batch" (urgent orders get re-priced, flagged ones
    * deleted) applied onto the fulfilled-orders table; the ORACLE is
    * the anti-join ∪ filtered-source formulation, an independent
    * restatement of MERGE semantics vs the full-outer-join plan. */
  private val q190 = Q("q190_merge_upsert",
    (s, dir) => {
      import s.implicits._
      val target = t(s, dir, "orders")
        .filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_custkey",
          round($"o_totalprice" * 100).cast("long").as("cents"))
      val source = t(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_custkey",
          (round($"o_totalprice" * 100).cast("long") + 10000L)
            .as("cents"),
          ($"o_orderkey" % 7 === 0).as("del"))
      graft.util.Merge.mergeInto(target, source, Seq("o_orderkey"),
          deleteFlagCol = Some("del"))
        .orderBy($"o_orderkey")
    },
    Some("""WITH target AS (
           |  SELECT o_orderkey,
           |         o_custkey,
           |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |  FROM orders WHERE o_orderstatus = 'F'),
           |source AS (
           |  SELECT o_orderkey, o_custkey,
           |         CAST(round(o_totalprice * 100) AS BIGINT) + 10000
           |           AS cents,
           |         o_orderkey % 7 = 0 AS del
           |  FROM orders WHERE o_orderpriority = '1-URGENT')
           |SELECT o_orderkey, o_custkey, cents FROM source
           |WHERE NOT del
           |UNION ALL
           |SELECT t.o_orderkey, t.o_custkey, t.cents FROM target t
           |WHERE NOT EXISTS (SELECT 1 FROM source s
           |                  WHERE s.o_orderkey = t.o_orderkey)
           |ORDER BY o_orderkey""".stripMargin))

  /** X88: incremental aggregate maintenance
    * ([[graft.util.IncrementalAgg]]) — the orders history split at a
    * date into "old" and "delta" slices, each reduced to mergeable
    * (cnt, sum, min, max) state, merged, finalized. The ORACLE
    * recomputes from the FULL table in one pass — the compare proves
    * merge(state(A), state(B)) = state(A ∪ B), i.e. mergeability
    * itself. */
  private val q191 = Q("q191_incremental_agg",
    (s, dir) => {
      import s.implicits._
      // a null order date falls in NEITHER half of the cut — it is
      // no observation on the incremental axis (fuzz-37)
      val all0 = t(s, dir, "orders")
        .filter($"o_orderdate".isNotNull)
        .select($"o_orderpriority",
          round($"o_totalprice" * 100).cast("long").as("cents"),
          $"o_orderdate")
      val cut = lit("1999-01-01").cast("timestamp")
      val old = all0.filter($"o_orderdate" < cut)
      val delta = all0.filter($"o_orderdate" >= cut)
      val merged = graft.util.IncrementalAgg.merge(
        Seq(graft.util.IncrementalAgg.state(old,
            Seq("o_orderpriority"), "cents"),
          graft.util.IncrementalAgg.state(delta,
            Seq("o_orderpriority"), "cents")),
        Seq("o_orderpriority"))
      graft.util.IncrementalAgg.finalizeState(merged)
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*)::BIGINT AS cnt,
           |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
           |    AS sum,
           |  min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min,
           |  max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max,
           |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT))::DOUBLE
           |        / count(*), 4) AS avg
           |FROM orders WHERE o_orderdate IS NOT NULL
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** L66: Flesch readability ([[graft.text.Readability.flesch]]) —
    * word/sentence/vowel-group counts are exact integers under pinned
    * regex conventions, so both ratio formulas are engine-identical. */
  private val q192 = Q("q192_readability",
    (s, dir) => {
      import s.implicits._
      graft.text.Readability.flesch(t(s, dir, "documents"), "doc_id",
          "text")
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |  len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
           |  greatest(1, len(list_filter(
           |    regexp_split_to_array(text, '[.!?]+'),
           |    s -> trim(s) != '')))::BIGINT AS n_sentences,
           |  len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
           |    AS n_syllables,
           |  CASE WHEN len(regexp_extract_all(text, '\S+')) > 0 THEN
           |    round(206.835
           |      - 1.015 * (len(regexp_extract_all(text, '\S+'))::DOUBLE
           |        / greatest(1, len(list_filter(
           |            regexp_split_to_array(text, '[.!?]+'),
           |            s -> trim(s) != ''))))
           |      - 84.6 * (len(regexp_extract_all(lower(text),
           |            '[aeiouy]+'))::DOUBLE
           |        / len(regexp_extract_all(text, '\S+'))), 4)
           |  END AS flesch_ease,
           |  CASE WHEN len(regexp_extract_all(text, '\S+')) > 0 THEN
           |    round(0.39 * (len(regexp_extract_all(text, '\S+'))::DOUBLE
           |        / greatest(1, len(list_filter(
           |            regexp_split_to_array(text, '[.!?]+'),
           |            s -> trim(s) != ''))))
           |      + 11.8 * (len(regexp_extract_all(lower(text),
           |            '[aeiouy]+'))::DOUBLE
           |        / len(regexp_extract_all(text, '\S+'))) - 15.59, 4)
           |  END AS fk_grade
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** §2.4 widening: deterministic argmax/argmin battery — the
    * max-of-struct idiom (lexicographic (value, tie-break...) ordering)
    * per group; the ORACLE selects the same rows with rank windows, an
    * independent formulation of argmax. */
  private val q193 = Q("q193_argmax",
    (s, dir) => {
      import s.implicits._
      // complete-case on the value (an argmax over null cents is
      // undefined and struct-ordering of null fields is
      // engine-ambiguous); null FLAG groups stay — the oracle joins
      // its two rank tables null-safely to keep them too (fuzz-16)
      val li = t(s, dir, "lineitem")
        .filter($"l_extendedprice".isNotNull) // pushable raw-column form
        .select($"l_returnflag",
          round($"l_extendedprice" * 100).cast("long").as("cents"),
          $"l_orderkey", $"l_linenumber".cast("long").as("ln"))
      li.groupBy($"l_returnflag")
        .agg(
          max(struct($"cents", $"l_orderkey", $"ln")).as("__mx"),
          min(struct($"cents", $"l_orderkey", $"ln")).as("__mn"))
        .select($"l_returnflag",
          $"__mx.cents".as("max_cents"),
          $"__mx.l_orderkey".as("max_orderkey"),
          $"__mn.cents".as("min_cents"),
          $"__mn.l_orderkey".as("min_orderkey"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH li AS (SELECT l_returnflag,
           |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
           |    l_orderkey, l_linenumber
           |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
           |mx AS (SELECT l_returnflag, cents, l_orderkey,
           |    row_number() OVER (PARTITION BY l_returnflag
           |      ORDER BY cents DESC, l_orderkey DESC,
           |               l_linenumber DESC) AS rk
           |  FROM li),
           |mn AS (SELECT l_returnflag, cents, l_orderkey,
           |    row_number() OVER (PARTITION BY l_returnflag
           |      ORDER BY cents, l_orderkey, l_linenumber) AS rk
           |  FROM li)
           |SELECT mx.l_returnflag,
           |  mx.cents AS max_cents, mx.l_orderkey AS max_orderkey,
           |  mn.cents AS min_cents, mn.l_orderkey AS min_orderkey
           |FROM mx JOIN mn
           |  ON mn.l_returnflag IS NOT DISTINCT FROM mx.l_returnflag
           |WHERE mx.rk = 1 AND mn.rk = 1
           |ORDER BY mx.l_returnflag""".stripMargin))

  /** §2.8 widening: higher-order array function battery — transform /
    * filter / aggregate / slice / reverse-zip over per-order sorted
    * price arrays, oracled against DuckDB's independent list_* family.
    * Exact integers throughout. */
  private val q194 = Q("q194_array_battery",
    (s, dir) => {
      import s.implicits._
      val arr = t(s, dir, "lineitem")
        .filter($"l_orderkey" % 101 === 0)
        .select($"l_orderkey",
          round($"l_extendedprice" * 100).cast("long").as("cents"))
        // complete-case: Spark collect_list SKIPS nulls while DuckDB
        // list() KEEPS them (and then sorts them first) — a fuzzed null
        // price desynced n/head/palindrome_total (fuzz-20)
        .filter($"cents".isNotNull)
        .groupBy($"l_orderkey")
        .agg(array_sort(collect_list($"cents")).as("a"))
      arr.select($"l_orderkey",
          size($"a").cast("long").as("n"),
          element_at($"a", 1).as("head"),
          aggregate($"a", lit(0L), (acc, x) => acc + x).as("total"),
          size(filter($"a", x => x % 2 === 0)).cast("long").as("n_even"),
          aggregate(transform($"a", x => x * 2), lit(0L),
            (acc, x) => acc + x).as("doubled_total"),
          aggregate(slice($"a", 1, 3), lit(0L), (acc, x) => acc + x)
            .as("top3_low_total"),
          aggregate(zip_with($"a", reverse($"a"), (x, y) => x + y),
            lit(0L), (acc, x) => acc + x).as("palindrome_total"))
        .orderBy($"l_orderkey")
    },
    Some("""WITH arr AS (
           |  SELECT l_orderkey,
           |    list_sort(list(CAST(round(l_extendedprice * 100)
           |      AS BIGINT))) AS a
           |  FROM lineitem WHERE l_orderkey % 101 = 0
           |    AND l_extendedprice IS NOT NULL
           |  GROUP BY 1)
           |SELECT l_orderkey,
           |  len(a)::BIGINT AS n,
           |  a[1] AS head,
           |  list_sum(a)::BIGINT AS total,
           |  len(list_filter(a, x -> x % 2 = 0))::BIGINT AS n_even,
           |  list_sum(list_transform(a, x -> x * 2))::BIGINT
           |    AS doubled_total,
           |  coalesce(list_sum(a[1:3]), 0)::BIGINT AS top3_low_total,
           |  list_sum(list_transform(range(1, len(a) + 1),
           |    i -> a[i] + a[len(a) - i + 1]))::BIGINT
           |    AS palindrome_total
           |FROM arr ORDER BY l_orderkey""".stripMargin))

  val all: Seq[Q] = Seq(q189, q190, q191, q192, q193, q194)
}
