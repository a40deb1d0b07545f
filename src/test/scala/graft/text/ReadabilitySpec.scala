package graft.text

import graft.SparkSuite

class ReadabilitySpec extends SparkSuite {
  import spark.implicits._

  test("hand-counted words, sentences, and vowel groups") {
    val df = Seq((1L, "The cat sat. The dog ran!")).toDF("id", "text")
    val r = Readability.flesch(df, "id", "text").collect().head
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    // vowel groups: e, a, a, e, o, a → 6
    assert(r.getAs[Long]("n_syllables") == 6L)
    val fre = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert(r.getAs[Double]("flesch_ease") ==
      BigDecimal(fre).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("no terminal punctuation still counts one sentence") {
    val df = Seq((1L, "hello world")).toDF("id", "text")
    val r = Readability.flesch(df, "id", "text").collect().head
    assert(r.getAs[Long]("n_sentences") == 1L)
    assert(r.getAs[Long]("n_words") == 2L)
  }

  test("empty text yields zero counts and null scores") {
    val df = Seq((1L, "")).toDF("id", "text")
    val r = Readability.flesch(df, "id", "text").collect().head
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.isNullAt(r.fieldIndex("flesch_ease")))
    assert(r.isNullAt(r.fieldIndex("fk_grade")))
  }

  test("simple prose scores easier than polysyllabic prose") {
    val df = Seq(
      (1L, "The cat sat on the mat. It was fun."),
      (2L, "Epidemiological heterogeneity necessitates " +
        "multidimensional characterization methodologies."))
      .toDF("id", "text")
    val m = Readability.flesch(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("flesch_ease")).toMap
    assert(m(1L) > 80.0)
    assert(m(2L) < 0.0)
    assert(m(1L) > m(2L))
  }
}
