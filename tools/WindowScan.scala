package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** One-off audit (r9 verdict #2): enumerate EVERY registry query whose
  * physical plan contains an unpartitioned window, with the nearest
  * aggregate grouping below each window to classify its bound.
  * Usage: tools/runjava.sh graft.tools.WindowScan [sfDir]
  */
object WindowScan {
  private def deepOps(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case im: InMemoryTableScanExec => im.children :+ im.relation.cachedPlan
      case other => other.children
    }
    p +: kids.flatMap(deepOps)
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val metricsOnly: Set[String] = if (args.length > 1) args(1).split(",").toSet else Set.empty
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val names =
      if (metricsOnly.nonEmpty) metricsOnly.toSeq.sorted
      else graft.SparkEntry.queries.keys.toSeq.sorted
    var found = 0
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(s, d)
        if (metricsOnly.nonEmpty) df.collect()
        val p = df.queryExecution.executedPlan
        val wins = deepOps(p).collect {
          case w: WindowExec if w.partitionSpec.isEmpty => ("Window", w.orderSpec.map(_.child.sql).mkString(","), w.child)
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => ("WinGroupLimit", w.orderSpec.map(_.child.sql).mkString(","), w.child)
        }
        if (wins.nonEmpty) {
          found += 1
          if (metricsOnly.nonEmpty) {
            val winExecs = deepOps(p).collect {
              case w: WindowExec if w.partitionSpec.isEmpty =>
                try w.child.execute().count()
                catch { case _: Throwable => -1L }
            }
            println(s"ROWS\t$n\tmax=${if (winExecs.isEmpty) -1 else winExecs.max}\tall=${winExecs.mkString(",")}")
          } else wins.foreach { case (kind, ord, child) =>
            val grp = deepOps(child).collectFirst {
              case a: BaseAggregateExec if a.groupingExpressions.nonEmpty =>
                a.groupingExpressions.map(_.name).mkString("+")
            }.getOrElse("<no-grouped-agg-below>")
            println(s"HIT\t$n\t$kind\torder=[$ord]\tgroupBelow=[$grp]")
          }
        } else if (metricsOnly.nonEmpty) println(s"ROWS\t$n\tmax=0\tall=")
      } catch { case e: Throwable =>
        println(s"ERR\t$n\t${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
      graft.ops.PipelineCache.releaseAll()
      s.sharedState.cacheManager.clearCache()
    }
    println(s"DONE queries=${names.size} withUnpartWindows=$found")
    s.stop()
  }
}
