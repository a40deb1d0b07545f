package graft.functions

import graft.SparkSuite
import graft.functions.gfunctions.{haversine_km, strip_accents}

class StripAccentsSpec extends SparkSuite {
  import spark.implicits._

  private def fold(s: String): String =
    Seq(Tuple1(s)).toDF("s").select(strip_accents($"s")).head().getString(0)

  test("pinned against DuckDB strip_accents probe values") {
    assert(fold("café naïve Zürich ño") == "cafe naive Zurich no")
    assert(fold("áèîöüñ ÅÉÎÕÜÇ") == "aeioun AEIOUC")
    // no decomposition → pass through (utf8proc parity)
    assert(fold("øæßđłŁ") == "øæßđłŁ")
    // cyrillic diacritics fold too
    assert(fold("ёЙ") == "еИ")
    assert(fold("中文") == "中文")
  }

  test("ascii fast path is identity") {
    assert(fold("Plain ASCII text 123!") == "Plain ASCII text 123!")
    assert(fold("") == "")
  }

  test("idempotent") {
    val once = fold("Müller-Lüdenscheidt")
    assert(once == "Muller-Ludenscheidt")
    assert(fold(once) == once)
  }

  test("haversine: pinned great-circle distances") {
    def d(a: (Double, Double), b: (Double, Double)): Double =
      Seq((a._1, a._2, b._1, b._2)).toDF("la", "lo", "lb", "lb2")
        .select(haversine_km($"la", $"lo", $"lb", $"lb2"))
        .head().getDouble(0)
    // equator degree ≈ 111.19 km
    assert(math.abs(d((0.0, 0.0), (0.0, 1.0)) - 111.19) < 0.1)
    // antipodal: half circumference ≈ 20015 km
    assert(math.abs(d((0.0, 0.0), (0.0, 180.0)) - 20015.1) < 1.0)
    assert(d((45.0, 45.0), (45.0, 45.0)) == 0.0)
    // symmetric
    assert(d((10.0, 20.0), (30.0, 40.0)) == d((30.0, 40.0), (10.0, 20.0)))
  }
}
