package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format coverage (SURVEY §2.3 "Scans/sources/sinks"):
  * CSV and JSON(lines) writers + readers exercised as roundtrips inside
  * a declared query — write the nation table to the format, read it
  * back WITH a declared schema (inference is banned per SURVEY §1.3),
  * aggregate. The oracle sees only the aggregation, so any
  * serialization defect (quoting, escaping, null encoding, type
  * round-trip) surfaces as a hash mismatch.
  */
object SourceSinkQueries {

  /** Stable within the JVM (repeat calls overwrite their own output),
    * unique across JVMs (concurrent Verify+Bench must not clobber each
    * other's roundtrip directory mid-read). */
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)

  private def roundtrip(s: SparkSession, d: String, format: String): DataFrame = {
    val src = Tables.nation(s, d)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_rt_${jvmTag}_${format}_" +
      d.replaceAll("[^a-zA-Z0-9]", "_")
    src.write.mode(SaveMode.Overwrite).format(format)
      .option("header", "true").save(path)
    val back = s.read.format(format)
      .option("header", "true").schema(src.schema).load(path)
    back.groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), min("n_name").as("first_nation"))
      .orderBy("n_regionkey")
  }

  def csvRoundtripAgg(s: SparkSession, d: String): DataFrame = roundtrip(s, d, "csv")
  def jsonRoundtripAgg(s: SparkSession, d: String): DataFrame = roundtrip(s, d, "json")
  /** Columnar binary format with its own type system + predicate
    * pushdown surface (Spark's built-in ORC reader/writer). */
  def orcRoundtripAgg(s: SparkSession, d: String): DataFrame = roundtrip(s, d, "orc")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "csv_roundtrip_agg"  -> csvRoundtripAgg _,
    "json_roundtrip_agg" -> jsonRoundtripAgg _,
    "orc_roundtrip_agg"  -> orcRoundtripAgg _,
  )

  private val aggSql =
    """SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_nation
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  val oracle: Map[String, String] = Map(
    "csv_roundtrip_agg"  -> aggSql,
    "json_roundtrip_agg" -> aggSql,
    "orc_roundtrip_agg"  -> aggSql,
  )
}
