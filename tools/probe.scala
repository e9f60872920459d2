// Per-query measurement + plan-dump probe (optimization rounds).
// Usage:
//   PROBE_QS=agg_rfm_segments,stat_esd_outliers PROBE_SF=/root/testdata/sf0.1 \
//   PROBE_REPS=3 PROBE_PLANDIR=plans/r14 PROBE_SUFFIX=before \
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.codegen.cache.maxEntries=10000 \
//     --conf spark.locality.wait=0 \
//     --conf spark.ui.enabled=false -i tools/probe.scala
// Timing methodology matches graft.Bench.consume (content checksum);
// one warm rep first (compile), then PROBE_REPS timed reps; the
// PipelineCache is released between reps ONLY when PROBE_RELEASE=1 so
// shared-base families measure like a bench sweep (first consumer pays).
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
val d = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
val qs = sys.env.getOrElse("PROBE_QS", "").split(",").map(_.trim).filter(_.nonEmpty)
val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
val planDir = sys.env.get("PROBE_PLANDIR")
val suffix = sys.env.getOrElse("PROBE_SUFFIX", "plan")
def consume(df: DataFrame): Unit = {
  df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)))).collect(); ()
}
// warm tables like the bench
Seq("region","nation","customer","supplier","part","orders","lineitem",
  "events","documents","embeddings").foreach { t =>
  try consume(graft.ops.Tables.byName(spark, d, t))
  catch { case e: Throwable => println(s"warmup $t failed: $e") }
}
for (q <- qs) {
  val fn = graft.SparkEntry.queries(q)
  planDir.foreach { dir =>
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val df = fn(spark, d)
    val txt = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/${q}_$suffix.txt"), txt)
  }
  if (reps > 0) {
    // warm rep (compile)
    val t0 = System.nanoTime(); consume(fn(spark, d))
    val warm = (System.nanoTime() - t0) / 1e9
    val times = (1 to reps).map { _ =>
      val t = System.nanoTime(); consume(fn(spark, d)); (System.nanoTime() - t) / 1e9
    }
    println(f"PROBE $q%-34s warm=$warm%7.3f  reps=${times.map(t => f"$t%.3f").mkString(",")}")
  } else println(s"PROBE $q plan-only")
}
graft.ops.PipelineCache.releaseAll()
System.exit(0)
