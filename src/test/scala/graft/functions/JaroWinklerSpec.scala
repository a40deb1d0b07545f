package graft.functions

import graft.SparkSuite
import graft.functions.gfunctions.jaro_winkler

/** Pins [[org.apache.spark.sql.graft.StringSim.jaroWinkler]] to values
  * probed from DuckDB `jaro_winkler_similarity` on this host (the q159
  * oracle function) plus the textbook reference pairs — so the kernel and
  * the oracle stay two independent implementations of one definition.
  */
class JaroWinklerSpec extends SparkSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(jaro_winkler($"a", $"b")).head().getDouble(0)

  test("textbook pairs match DuckDB-probed values") {
    assert(approx(jw("MARTHA", "MARHTA"), 0.9611111111111111))
    assert(approx(jw("DIXON", "DICKSONX"), 0.8133333333333332))
    assert(approx(jw("JELLYFISH", "SMELLYFISH"), 0.8962962962962964))
    assert(approx(jw("DWAYNE", "DUANE"), 0.8400000000000001))
    assert(approx(jw("shackleford", "shackelford"), 0.9818181818181818))
  }

  test("empty-string convention: 0.0 even for both empty (DuckDB)") {
    assert(jw("", "") === 0.0)
    assert(jw("", "a") === 0.0)
    assert(jw("a", "") === 0.0)
  }

  test("equal strings are 1.0; window-0 transposition is 0.0") {
    assert(jw("a", "a") === 1.0)
    assert(jw("abc", "abc") === 1.0)
    // max len 2 → window 0 → diagonal only → no matches
    assert(jw("ab", "ba") === 0.0)
  }

  test("boost applies only above 0.7 jaro, strictly") {
    // jaro 0.7333 with prefix 'ab' → boosted to 0.7867
    assert(approx(jw("ab", "abzzzzzzzz"), 0.7866666666666667))
    // jaro exactly 2/3 with prefix 'aa' → NOT boosted
    assert(approx(jw("aaab", "aazz"), 0.6666666666666666))
  }

  test("prefix boost caps at 4 characters") {
    // common prefix 9, jaro 0.9667 → 0.9667 + 4*0.1*(1-0.9667) = 0.98
    assert(approx(jw("zzzzzappl", "zzzzzapple"), 0.98))
  }

  test("odd raw transposition count floors (ABCVWXYZ/CABVWXYZ)") {
    // 3 out-of-order matched positions → t = 1, jaro = 0.9583 (= jw,
    // prefix 0)
    assert(approx(jw("ABCVWXYZ", "CABVWXYZ"), 0.9583333333333334))
  }

  test("null propagates") {
    val r = Seq((Option.empty[String], Option("x")))
      .toDF("a", "b").select(jaro_winkler($"a", $"b")).head()
    assert(r.isNullAt(0))
  }
}
