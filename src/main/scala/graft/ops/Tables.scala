package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver corpus (`/root/testdata/sf*`).
  *
  * Tables are self-describing parquet (see FIXTURES.md §3); we rely on
  * Catalyst to push filters / prune columns into the scan, so the loader
  * deliberately does nothing beyond `spark.read.parquet` — no caching, no
  * repartition. At 100 TB the same call reads a partitioned directory and
  * partition pruning applies; nothing here would change.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    * default (PARQUET_TYPE_ILLEGAL). Read nanos as long and truncate to
    * Spark's µs timestamps — every declared query buckets with
    * `date_trunc` ≥ seconds, so the lost sub-µs digits are unobservable. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Name-dispatched accessor that routes through the per-table quirks
    * (events' nanos handling) — use this instead of `apply` when the
    * table name is data, e.g. Bench's warmup loop. */
  def byName(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "events" => events(s, d)
    case n => apply(s, d, n)
  }
}
