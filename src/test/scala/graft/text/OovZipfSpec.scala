package graft.text

import graft.SparkSuite

class OovZipfSpec extends SparkSuite {
  import spark.implicits._

  test("oovRate: vocab cut is deterministic; instance-level rate") {
    // corpus counts: the=3, cat=2, dog=2, x=1, y=1; vocab(3) by
    // (count desc, term asc) = {the, cat, dog}
    val docs = Seq(
      (1L, "the cat the dog"),
      (2L, "the cat dog x y")).toDF("doc_id", "text")
    val r = TextAnalysis.oovRate(docs, "doc_id", "text", 3)
      .orderBy("id")
      .as[(Long, Long, Long, Double)].collect()
    assert(r(0) == ((1L, 4L, 0L, 0.0)))
    assert(r(1) == ((2L, 5L, 2L, 0.4)))
  }

  test("oovRate: tie at the vocab boundary broken by term order") {
    // counts: a=2, b=1, c=1 → vocab(2) = {a, b} (b < c)
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.oovRate(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, Double)].head()
    assert(r == ((1L, 4L, 1L, 0.25)))
  }

  test("zipfFit: exact power law recovers its exponent") {
    // counts 64, 16, 4, 1 over ranks 1,2,4,8? — instead construct
    // counts c_r = 2^(8-r)... ln c = ln 2 (8 - r) is linear in r, not
    // ln r. Use c_r = round(100/r) at ranks 1,2,4: not exact. Take a
    // TRUE Zipf corpus: counts 8,4,2,1 at ranks 1..4 — ln c vs ln r is
    // NOT exactly linear, so just pin the fit against hand-solved OLS.
    val words = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(1)("d")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = CorpusStats.zipfFit(docs, "text")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == 4L && r._2 == 15L)
    // hand OLS of y=ln(8,4,2,1) on x=ln(1,2,3,4)
    val x = Seq(1.0, 2.0, 3.0, 4.0).map(math.log)
    val y = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val n = 4.0
    val sx = x.sum; val sy = y.sum
    val cxx = x.map(v => v * v).sum - sx * sx / n
    val cxy = x.zip(y).map { case (a, b) => a * b }.sum - sx * sy / n
    val cyy = y.map(v => v * v).sum - sy * sy / n
    val slope = cxy / cxx
    assert(r._3 == math.rint(-slope * 1e4) / 1e4)
    assert(r._4 == math.rint((sy - slope * sx) / n * 1e4) / 1e4)
    assert(r._5 == math.rint(cxy * cxy / (cxx * cyy) * 1e4) / 1e4)
  }
}
