package graft.report

import graft.SparkSuite

class StaffingInventorySpec extends SparkSuite {
  import spark.implicits._

  test("erlangStaffing: the M/M/c classic — load 2 Erlangs needs 4 " +
    "agents for P(wait) <= 0.2, and c_req covers the load") {
    // 200 arrivals over 100s (lambda = 2/s), each 1s of service
    val us = 1000000L
    val iv = (0 until 200).map(i =>
      ("q", i * us / 2, i * us / 2 + us)).toDF("g", "s", "e")
    val r = Staffing.erlangStaffing(iv, "g", "s", "e",
      targetWait = 0.2).head()
    val a = r.getAs[Double]("offered_erlangs")
    assert(math.abs(a - 2.0) < 0.1)
    // ErlangC(3, 2) = 0.444, ErlangC(4, 2) = 0.174 -> c_req = 4
    assert(r.getAs[Int]("c_req") == 4)
    assert(r.getAs[Double]("p_wait") < 0.2)
  }

  test("erlangStaffing: saturation beyond the grid reports null " +
    "c_req with visible p_wait") {
    val us = 1000000L
    // ~100 offered Erlangs (200 arrivals over ~2s, 1s service
    // each) > maxC 60 -> infeasible everywhere on the grid
    val iv = (0 until 200).map(i =>
      ("sat", i * us / 200, i * us / 200 + us)).toDF("g", "s", "e")
    val row = Staffing.erlangStaffing(iv, "g", "s", "e").head()
    assert(row.isNullAt(row.fieldIndex("c_req")))
    assert(row.getAs[Double]("p_wait") == 1.0)
  }

  test("demandClasses: constructed quadrants classify as labeled") {
    // 12 monthly buckets; item A: steady 10 every month (smooth);
    // item B: 10 every 3rd month (intermittent); item C: monthly but
    // wildly variable (erratic); item D: rare AND variable (lumpy)
    val rows =
      (1 to 12).map(m => ("A", m, 10.0)) ++
      Seq(3, 6, 9, 12).map(m => ("B", m, 10.0)) ++
      (1 to 12).map(m => ("C", m, if (m % 2 == 0) 1.0 else 40.0)) ++
      Seq(4, 12).map(m => ("D", m, if (m == 4) 1.0 else 50.0))
    val r = Inventory.demandClasses(rows.toDF("item", "m", "q"),
      "item", "m", "q").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("smooth" -> 1L, "intermittent" -> 1L,
      "erratic" -> 1L, "lumpy" -> 1L))
  }
}
