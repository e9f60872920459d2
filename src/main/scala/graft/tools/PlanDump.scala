package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the executed physical plan of one registry query — the
  * plan-iteration loop the brief asks for (`.explain` until it's the plan
  * you'd want). Usage:
  *   tools/runjava.sh graft.tools.PlanDump <query> [sfDir] [shufflePartitions]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val parts = if (args.length > 2) args(2) else "4"
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(s, d)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    s.stop()
  }
}
