package graft.ml

import graft.SparkSuite

class NaiveBayesSpec extends SparkSuite {
  import spark.implicits._

  test("trainScore matches a hand-computed two-class model") {
    val train = Seq(
      (1L, "spark spark shuffle", "tech"),
      (2L, "spark join", "tech"),
      (3L, "cat dog", "pets"))
      .toDF("doc_id", "text", "label")
    val test = Seq((10L, "spark shuffle"), (11L, "dog dog")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(train, test, "doc_id", "text", "label")
      .as[(Long, String, Double)].collect().toSeq
    // model: priors tech=2/3, pets=1/3; vocab={spark,shuffle,join,cat,dog} |V|=5
    // tech tokens N=5: spark=3, shuffle=1, join=1; pets N=2: cat=1, dog=1
    def sc(prior: Double, terms: Seq[(Int, Int)]): Double = {
      val raw = math.log(prior) +
        terms.map { case (n, d) => math.log((n + 1.0) / d) }.sum
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val d10tech = sc(2.0 / 3, Seq((3, 10), (1, 10)))   // spark, shuffle | tech
    val d11pets = sc(1.0 / 3, Seq((1, 7), (1, 7)))     // dog, dog | pets
    assert(got == Seq((10L, "tech", d10tech), (11L, "pets", d11pets)))
  }

  test("tie on score predicts the lexicographically smallest class") {
    // perfectly symmetric classes: both scores equal for "x y"
    val train = Seq(
      (1L, "x", "b"), (2L, "y", "a")).toDF("doc_id", "text", "label")
    val test = Seq((10L, "x y")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(train, test, "doc_id", "text", "label")
      .as[(Long, String, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((10L, "a")))
  }

  test("unseen tokens smooth rather than zero out") {
    val train = Seq((1L, "alpha beta", "k")).toDF("doc_id", "text", "label")
    val test = Seq((2L, "gamma gamma")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(train, test, "doc_id", "text", "label")
      .as[(Long, String, Double)].collect().toSeq
    // ln(1) prior + 2·ln((0+1)/(2+2)) = 2·ln(1/4)
    val exp = BigDecimal(2 * math.log(0.25))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((2L, "k", exp)))
  }
}
