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

  test("per-group mode picks the true argmax with the smallest-value tie-break") {
    import org.apache.spark.sql.functions._
    val modes = SparkEntry.queries("agg_mode_per_group")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val counts = graft.ops.Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(modes.nonEmpty)
    modes.foreach { case (status, priority, n) =>
      val grp = counts.filter(_._1 == status)
      assert(grp.forall(_._3 <= n), s"$status: $priority/$n is not the max")
      // ties must break to the lexically smallest priority
      val tied = grp.filter(_._3 == n).map(_._2).min
      assert(priority == tied, s"$status: tie-break picked $priority over $tied")
    }
  }

  test("repetition score ratios are consistent and the flag matches its definition") {
    val rows = SparkEntry.queries("text_repetition_score")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTypes, maxCnt) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (ttr, topFrac, flag) = (r.getDouble(4), r.getDouble(5), r.getBoolean(6))
      assert(nTypes <= nTok && maxCnt <= nTok && maxCnt >= 1)
      assert(ttr == nTypes.toDouble / nTok.toDouble)
      assert(topFrac == maxCnt.toDouble / nTok.toDouble)
      assert(flag == (topFrac > 0.2 || ttr < 0.3))
    }
  }

  test("document frequency is bounded by the corpus size and sorted") {
    val total = graft.ops.Tables.documents(spark, sfDir).count()
    val rows = SparkEntry.queries("text_doc_frequency")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 40)
    assert(rows.forall { case (_, df, frac) =>
      df >= 1 && df <= total && frac == df.toDouble / total.toDouble })
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq) // df desc
  }
}
