package graft.sources

import graft.SparkSpec

class GraftCatalogSpec extends SparkSpec {

  test("registered views answer plain SQL with full pushdown") {
    val s = SparkSpec.session
    GraftCatalog.registerTestdata(s, "/root/testdata/sf0.001")
    val df = s.sql(
      """SELECT n_name, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 5""".stripMargin)
    assert(df.count() == 5)
    // filter must still reach the parquet scan through the view
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderstatus"))
  }

  test("events view exposes the normalized timestamp") {
    val s = SparkSpec.session
    GraftCatalog.registerTestdata(s, "/root/testdata/sf0.001")
    val r = s.sql(
      "SELECT count(*) FROM events WHERE event_time >= TIMESTAMP '2024-01-01 00:00:00'")
      .head().getLong(0)
    assert(r > 0)
  }
}
