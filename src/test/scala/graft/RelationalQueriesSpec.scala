package graft

import graft.queries.RelationalQueries

class RelationalQueriesSpec extends SparkTestBase {

  test("every relational query runs and returns rows on sf0.001") {
    RelationalQueries.all.foreach { q =>
      val df = q.fn(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("query names are unique and oracle columns are aliased") {
    val names = RelationalQueries.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("q01 aggregates match a hand-computed slice") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    val row = df.filter("l_returnflag = 'A' and l_linestatus = 'F'").collect()
    assert(row.length <= 1)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
