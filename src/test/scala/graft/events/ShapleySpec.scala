package graft.events

import graft.SparkSuite

class ShapleySpec extends SparkSuite {
  import spark.implicits._

  test("threeChannel: single decisive channel takes all credit") {
    // users: 1 touches A and converts; 2 touches nothing, no conv;
    // 3 touches A, converts; 4 touches B, no conv
    // v({A}) = 1 (users 1,3), v({B}) = 0, v({}) = 0; unobserved
    // coalitions zero-fill (documented), so adding B to {A} "kills"
    // conversion and B/C get -1/6 — and efficiency still holds:
    // sum = 1/3 - 1/6 - 1/6 = v(C) - v(empty) = 0
    val ev = Seq(
      (1L, "a"), (1L, "conv"), (3L, "a"), (3L, "conv"),
      (2L, "other"), (4L, "b")).toDF("u", "et")
    val r = Shapley.threeChannel(ev, "u", "et", Seq("a", "b", "c"),
        "conv")
      .as[(String, Double, Double)].collect()
    val m = r.map(x => x._1 -> x._2).toMap
    assert(math.abs(m("a") - 1.0 / 3) < 1e-6)
    assert(math.abs(m("b") + 1.0 / 6) < 1e-6)
    assert(math.abs(m("c") + 1.0 / 6) < 1e-6)
    assert(math.abs(m("a") + m("b") + m("c")) < 2e-6)  // efficiency (6dp rounds)
    assert(r.head._3 == 0.5)   // 2 of 4 users converted
  }

  test("threeChannel: symmetric channels share equally") {
    // every converter touched both a and b: v110 = 1, all else 0
    val ev = Seq((1L, "a"), (1L, "b"), (1L, "conv"),
      (2L, "a"), (2L, "b"), (2L, "conv"), (3L, "x")).toDF("u", "et")
    val r = Shapley.threeChannel(ev, "u", "et", Seq("a", "b", "c"),
        "conv")
      .as[(String, Double, Double)].collect()
    val m = r.map(x => x._1 -> x._2).toMap
    // shapley(a) = 1/6*(v110 - v010) + 1/3*(v111 - v011) = 1/6
    assert(math.abs(m("a") - 1.0 / 6) < 1e-6)
    assert(m("a") == m("b"))
  }
}
