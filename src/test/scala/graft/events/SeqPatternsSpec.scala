package graft.events

import java.sql.Timestamp

import graft.SparkSuite

class SeqPatternsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def rnd(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pairSupport: first-A-before-last-B counting") {
    // u1: a@1, b@2 -> (a,b) ordered; (b,a) not
    // u2: a@5, b@3 -> (b,a) ordered; (a,b) not
    val ev = Seq((1L, "a", ts(1)), (1L, "b", ts(2)),
      (2L, "a", ts(5)), (2L, "b", ts(3))).toDF("u", "t", "ts")
    val r = SeqPatterns.pairSupport(ev, "u", "t", "ts")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(("a", "b", 1L, 2L, 0.5), ("b", "a", 1L, 2L, 0.5)))
  }

  test("transitionEntropy: per-state H and weighted entropy rate") {
    // transitions: a->b (u1), b->a (u1), b->c (u2), b->b (u3)
    // state a: {b} H=0; state b: {a,c,b} H=ln3; rate = 3*ln3/4
    val ev = Seq(
      (1L, "a", ts(1), 1L), (1L, "b", ts(2), 2L), (1L, "a", ts(3), 3L),
      (2L, "b", ts(1), 4L), (2L, "c", ts(2), 5L),
      (3L, "b", ts(1), 6L), (3L, "b", ts(2), 7L))
      .toDF("u", "t", "ts", "id")
    val m = SeqPatterns.transitionEntropy(ev, "u", "t", "ts", "id")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))))
      .toMap
    val h3 = math.log(3.0)
    assert(m("a") == ((1L, 0.0, 0.25, rnd(3 * h3 / 4))))
    assert(m("b") == ((3L, rnd(h3), 0.75, rnd(3 * h3 / 4))))
  }
}
