package graft.functions

import graft.SparkSuite
import graft.functions.gfunctions.dict_scrub

/** Aho–Corasick dictionary scrub (q422's kernel): the pinned
  * leftmost-longest non-overlapping contract, nested/overlapping
  * dictionaries, UTF-8 safety, and a seeded parity sweep against the
  * independent java.util.regex longest-first-alternation reference
  * (the same semantics the DuckDB oracle replays with RE2). */
class DictScrubSpec extends SparkSuite {
  import spark.implicits._

  private val dict = Seq(
    "value table part", "value table", "table part", "row scan",
    "fast merge", "window", "scan", "merge")

  private def scrub(s: String, d: Seq[String] = dict): String =
    Seq(Tuple1(s)).toDF("s").select(dict_scrub($"s", d)).head().getString(0)

  test("leftmost-longest, non-overlapping") {
    assert(scrub("value table part x") == "[MASK] x")
    // longest at the leftmost position wins over the shorter prefix
    assert(scrub("value table partial") == "[MASK]ial")
    // leftmost wins over a longer match starting later
    assert(scrub("scan row scan") == "[MASK] [MASK]")
    assert(scrub("row scandal") == "[MASK]dal")
    // nested suffix term found via the dict-link chain: "merge" at 0
    // (leftmost), then "fast merge" (longest at its own position)
    assert(scrub("merge fast merge") == "[MASK] [MASK]")
    assert(scrub("a window b") == "a [MASK] b")
  }

  test("substring semantics (no word boundaries), adjacency, edges") {
    assert(scrub("windowwindow") == "[MASK][MASK]")
    assert(scrub("window") == "[MASK]")
    assert(scrub("windo") == "windo")
    assert(scrub("") == "")
    assert(scrub("no hits here at all") == "no hits here at all")
  }

  test("UTF-8 safety: ASCII patterns never match inside multi-byte") {
    assert(scrub("🀄scan🀄") ==
      "🀄[MASK]🀄")
    assert(scrub("héllo scan wörld") == "héllo [MASK] wörld")
  }

  test("null in, null out; custom mask") {
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("s")
      .select(dict_scrub($"s", dict)).head()
    assert(r.isNullAt(0))
    assert(Seq(Tuple1("a scan b")).toDF("s")
      .select(dict_scrub($"s", dict, "*")).head().getString(0) == "a * b")
  }

  test("seeded parity with the longest-first regex alternation") {
    // the independent reference the DuckDB oracle uses: alternation
    // ordered longest-first, global replace — java.util.regex here
    val ordered = dict.sortBy(t => (-t.length, t))
    val re = ordered.map(java.util.regex.Pattern.quote).mkString("|")
    val pat = java.util.regex.Pattern.compile(re)
    def ref(s: String): String = pat.matcher(s).replaceAll("[MASK]")
    val vocab = Array("value", "table", "part", "row", "scan", "fast",
      "merge", "window", "x", " ", "val", "scanner", "win")
    val rnd = new scala.util.Random(4242)
    val samples = (1 to 300).map { _ =>
      (1 to (1 + rnd.nextInt(12)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    } :+ "value table part value table table part" :+
      "value value table table part part"
    val df = samples.map(Tuple1(_)).toDF("s")
    val got = df.select(dict_scrub($"s", dict)).as[String].collect()
    samples.zip(got).foreach { case (s, g) =>
      assert(g == ref(s), s"input: '$s'")
    }
  }
}
