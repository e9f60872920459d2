package graft

import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Dynamic partition pruning pin: joining a Hive-partitioned fact on
  * its partition column against a FILTERED dim must inject a runtime
  * `dynamicpruning` partition filter — at 100 TB the fact side then
  * reads only the partitions the dim's surviving keys name, decided at
  * run time. Complements the static prune pin in PlanShapeSpec. */
class DppSpec extends SparkTestBase {

  test("partitioned fact scan gets a dynamicpruning filter from the dim side") {
    import spark.implicits._
    val conf = spark.conf
    val savedRatio = conf.getOption(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_dpp_test"
    try {
      // tiny test tables defeat the cost heuristic; DPP decisions are
      // plan-shape driven once the ratio clears
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10000")
      Tables.documents(spark, sfDir).write
        .mode("overwrite").partitionBy("lang").parquet(s"$base/fact")
      // the dim must be a SCANNED relation with a live Filter — an
      // in-memory Seq constant-folds the filter away and DPP sees no
      // selective predicate
      Seq(("en", "english"), ("de", "german"), ("zh", "chinese"))
        .toDF("dim_lang", "lang_name")
        .write.mode("overwrite").parquet(s"$base/dim")
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim")
        .filter(col("lang_name") === "english")
      val j = fact.join(dim, fact("lang") === dim("dim_lang"))
        .groupBy("lang").agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning") || p.contains("DynamicPruning"),
        s"expected a dynamic partition-pruning filter on the fact scan:\n$p")
    } finally savedRatio match {
      case Some(v) => conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", v)
      case None => conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }
}
