package graft.functions

import graft.SparkSuite
import graft.functions.gfunctions.damerau_levenshtein

class DamerauLevenshteinSpec extends SparkSuite {
  import spark.implicits._

  private def dl(a: String, b: String): Long =
    Seq((a, b)).toDF("a", "b")
      .select(damerau_levenshtein($"a", $"b")).head().getLong(0)

  test("unrestricted variant: CA->ABC is 2 (OSA would say 3), " +
    "matching DuckDB's damerau_levenshtein probe") {
    assert(dl("CA", "ABC") == 2L)
    assert(dl("ABC", "CA") == 2L)
  }

  test("pinned against DuckDB probe values") {
    // probed on this host: see CatalogEcon2 q176 scaladoc
    assert(dl("kitten", "sitting") == 3L)
    assert(dl("ab", "ba") == 1L)
    assert(dl("a cat", "an act") == 2L)
    assert(dl("xABx", "xBAx") == 1L)
  }

  test("degenerate cases: empty, equal, disjoint") {
    assert(dl("", "abc") == 3L)
    assert(dl("abc", "") == 3L)
    assert(dl("", "") == 0L)
    assert(dl("abc", "abc") == 0L)
    assert(dl("abc", "xyz") == 3L)
  }

  test("symmetric and bounded by max length") {
    val cases = Seq(("graft", "craft"), ("spark", "sprak"),
      ("abcdef", "badcfe"))
    cases.foreach { case (a, b) =>
      assert(dl(a, b) == dl(b, a))
      assert(dl(a, b) <= math.max(a.length, b.length))
    }
    // three adjacent transpositions
    assert(dl("abcdef", "badcfe") == 3L)
  }

  test("never exceeds levenshtein; transpositions strictly cheaper") {
    val df = Seq(("preist", "priest"), ("hte", "the"), ("form", "from"))
      .toDF("a", "b")
    import org.apache.spark.sql.functions.levenshtein
    df.select(damerau_levenshtein($"a", $"b").as("dl"),
        levenshtein($"a", $"b").cast("long").as("lev"))
      .collect().foreach { r =>
        assert(r.getLong(0) <= r.getLong(1))
        assert(r.getLong(0) == 1L)
      }
  }
}
