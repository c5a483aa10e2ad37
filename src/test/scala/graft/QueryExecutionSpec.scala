package graft

/** Executes EVERY registered query end-to-end at sf0.001 — the missing layer
  * between PlanAuditSpec (analysis-time shape) and the driver's out-of-band
  * Verify/oracle run. An analysis-time guard alone missed nothing in round 8
  * only because the events-schema break happened to fail analysis; a runtime
  * failure (a bad cast on real data, a non-converging loop, an empty-input
  * edge) would sail through the plan audit and surface rounds later. This
  * makes `sbt test` the single local gate: if it is green, every query at
  * least RUNS.
  */
class QueryExecutionSpec extends SparkTestBase {

  test("every registered query executes at sf0.001 and its oracle-SQL entry exists") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, s"queries failed to execute:\n${failures.mkString("\n")}")
    // every oracle entry points at a registered query (a dangling oracle is
    // a silently-uncovered correctness claim)
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL with no query: $dangling")
  }

  test("the flagship entry returns rows (driver smoke-check contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
