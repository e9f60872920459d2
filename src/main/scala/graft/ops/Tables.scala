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
  /** events.ts has shipped as TIMESTAMP(NANOS) in some corpus versions
    * (Spark 4 rejects it by default — PARQUET_TYPE_ILLEGAL — so we read
    * nanos as long and truncate to µs) and as plain TIMESTAMP(MICROS)
    * in others (arrives as TIMESTAMP_NTZ; cast to the session-local
    * type every query downstream expects — the session runs UTC, so
    * the wall-clock values are the same instants the nanos path
    * produced). Dispatch on the arrived type so both corpus layouts
    * work; every declared query buckets with `date_trunc` ≥ seconds,
    * so sub-µs digits are unobservable either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
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
