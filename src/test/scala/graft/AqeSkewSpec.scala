package graft

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}
import org.apache.spark.sql.functions._

/** Adaptive Query Execution skew handling — the AUTOMATIC complement of
  * the manual `join_skew_salted` operator: when one join key carries a
  * disproportionate share of rows, AQE's OptimizeSkewedJoin must split
  * the hot partition into parallel sub-reads at runtime instead of
  * letting one task absorb the whole key. The spec builds a synthetic
  * hot key (one key with ~100× the rows of its peers), lowers the skew
  * thresholds so the fixture-sized frames qualify, and asserts BOTH the
  * result correctness and the presence of a skewed AQE shuffle read in
  * the final adaptive plan — pinning that the engine's config surface
  * actually engages the optimization (a silently-disabled AQE would
  * pass results and fail here). */
class AqeSkewSpec extends SparkTestBase {

  test("AQE splits a hot join key into skewed partition sub-reads") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // fixture-sized thresholds: the hot partition (~100k rows of
      // 2×long) is "skewed" relative to 1 KB advisory sizing
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.shuffle.partitions", "4")
      // left: key 0 is hot (100k rows), keys 1..9 have 100 each
      val left = spark.range(0, 100000).select(lit(0L).as("k"), col("id").as("lv"))
        .unionAll(spark.range(0, 900)
          .select((col("id") % 9 + 1).as("k"), col("id").as("lv")))
      val right = spark.range(0, 10).select(col("id").as("k"), (col("id") * 10).as("rv"))
      val joined = left.join(right, "k")
      // collect THIS DataFrame (AQE finalizes the plan on execution;
      // a derived frame would leave joined's own plan unexecuted)
      val collected = joined.collect()
      val rows = collected.groupBy(_.getLong(0)).view.mapValues(_.length.toLong)
      // correctness first: every key's row count is exact
      assert(rows(0L) == 100000L)
      (1L to 9L).foreach(k => assert(rows(k) == 100L, s"key $k"))
      // then the plan: the executed adaptive plan must contain an AQE
      // shuffle read with at least one skewed-split partition. Walk
      // THROUGH query-stage boundaries (stages hold their subplan
      // outside `children`, so a plain collect stops at them).
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      def all(p: SparkPlan): Seq[SparkPlan] = {
        val extra = p match {
          case q: QueryStageExec => Seq(q.plan)
          case _ => Nil
        }
        p +: (p.children ++ extra).flatMap(all)
      }
      val exec = joined.queryExecution.executedPlan
      val adaptive = exec.collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.isDefined, s"no adaptive plan:\n$exec")
      val nodes = all(adaptive.get.executedPlan)
      val reads = nodes.collect { case r: AQEShuffleReadExec => r }
      assert(reads.nonEmpty, s"no AQE shuffle reads:\n${adaptive.get.executedPlan}")
      val skewed = reads.exists(_.partitionSpecs.exists {
        case _: org.apache.spark.sql.execution.PartialReducerPartitionSpec => true
        case _ => false
      })
      val skewJoin = nodes.exists {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          j.isSkewJoin
        case _ => false
      }
      assert(skewed && skewJoin,
        s"no skewed split (reads=$skewed join=$skewJoin):\n${adaptive.get.executedPlan}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
