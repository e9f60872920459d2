package graft

import org.apache.spark.sql.functions._

import graft.ops.Tables

/** 100 TB posture pin: Spark's runtime bloom-filter injection must
  * remain applicable to the engine's fact-fact join shape — a selective
  * dimension-side filter induces a `might_contain` probe on the fact
  * scan side, cutting shuffled fact rows before the join. The size
  * thresholds that gate it in production are scaled down here (the test
  * corpus is tiny); what is pinned is that the ENGINE's plan shape
  * remains eligible — joins stay equi-joins on raw columns, so the
  * optimizer rule fires.
  */
class RuntimeFilterSpec extends SparkTestBase {

  test("selective fact-fact join stays eligible for runtime bloom filter pruning") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // at 100 TB the dim side exceeds the broadcast threshold and the
      // join shuffles — model that here, since bloom pruning only pays
      // (and only fires) on shuffle joins
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sfDir)
      val ord = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000)
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") || opt.contains("bloom_filter_agg"), opt)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
