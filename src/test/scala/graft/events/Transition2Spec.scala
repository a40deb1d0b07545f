package graft.events

import graft.SparkSuite

class Transition2Spec extends SparkSuite {
  import spark.implicits._

  test("transitionMatrix2: hand-counted trigram probabilities") {
    // user u: a b c a b d  → trigrams: (a,b,c), (b,c,a), (c,a,b), (a,b,d)
    // prefix (a,b): c 1, d 1 → p 0.5 each
    val df = Seq("a", "b", "c", "a", "b", "d").zipWithIndex
      .map { case (t, i) => (1L, i.toLong, t) }
      .toDF("u", "ts", "et")
    val r = Sessionize.transitionMatrix2(df, "u", "ts", "et")
      .orderBy("prev", "cur", "nxt")
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("a", "b", "c", 1L, 0.5), ("a", "b", "d", 1L, 0.5),
      ("b", "c", "a", 1L, 1.0), ("c", "a", "b", 1L, 1.0)))
  }

  test("transitionMatrix2: trigrams never cross user boundaries") {
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "c"),
      (2L, 4L, "d")).toDF("u", "ts", "et")
    val r = Sessionize.transitionMatrix2(df, "u", "ts", "et").count()
    assert(r == 0L)   // no user has 3 events
  }
}
