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

  test("AQE splits a skewed join partition at runtime") {
    // a hot key owns ~80% of rows — the 100 TB failure mode where one
    // straggler task owns the join. Thresholds are scaled to the test
    // corpus; what is pinned is that the engine's join shape lets AQE's
    // skew-split fire (equi-join, shuffle join, no custom partitioning).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> conf.getOption(k))
    // sf0.01: big enough that the hot partition clears the (scaled)
    // byte thresholds the skew rule gates on
    val sf = "/root/testdata/sf0.01"
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // skew-split only matches Sort-over-shuffle DIRECTLY under the
      // join on both sides — keep both inputs plain projections
      val hot = when(col("l_orderkey") % 10 < 8, lit(1L)).otherwise(col("l_orderkey"))
      // split specs are MAPPER-granular: a single-file scan is one map
      // task, which makes the hot reduce partition unsplittable — spread
      // the map side first (at 100 TB there are thousands of mappers)
      val left = Tables.lineitem(spark, sf).repartition(8)
        .select(hot.as("k"), col("l_extendedprice"))
      val right = Tables.orders(spark, sf).select(
        col("o_orderkey").as("k"), col("o_totalprice"))
      val j = left.join(right, "k").agg(count(lit(1)).as("n"))
      j.collect() // AQE decides skew handling at runtime — must execute
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
