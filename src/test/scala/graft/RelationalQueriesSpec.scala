package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class RelationalQueriesSpec extends SparkTestBase {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every query has matching oracle keys or documented omission") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("star join broadcasts the dimension tables") {
    val plan = graft.ops.RelationalQueries
      .joinStarMultiway(spark, sfDir).queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$s")
  }
}
