// Micro-experiment for the round-15 loop unroll: does a chained
// multi-round plan (each round referencing its predecessor twice)
// execute each round's exchange ONCE via ReuseExchange with AQE off,
// and how does one k-round job compare to k one-round jobs on
// scheduler barriers and wall time?
//
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.ui.enabled=false -i tools/unroll_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

val jobs = new AtomicInteger(0)
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
})

spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.conf.set("spark.sql.shuffle.partitions", "4")

// synthetic pagerank-like state: 2000 vertices, chain-ish adjacency
val verts = spark.range(2000).select(col("id").as("x")).localCheckpoint()
val adjRaw = spark.range(2000).select(col("id").as("src"), ((col("id") * 7 + 1) % 2000).as("dst"))
  .unionAll(spark.range(2000).select(((col("id") * 7 + 1) % 2000).as("src"), col("id").as("dst")))
val adj = adjRaw.join(adjRaw.groupBy("src").agg(count(lit(1)).as("deg")), "src").localCheckpoint()

def step(cur: DataFrame): DataFrame = {
  val sums = cur.join(adj, col("x") === col("src"))
    .select(col("dst"), (col("pr") / col("deg")).as("c"))
    .groupBy("dst").agg(sum("c").as("sc"))
  cur.select(col("x"), col("pr").as("prev"))
    .join(sums.select(col("dst").as("x"), col("sc")), Seq("x"), "left_outer")
    .select(col("x"), (lit(0.1) + lit(0.85) * coalesce(col("sc"), lit(0.0))).as("pr"), col("prev"))
}

val init = verts.select(col("x"), lit(1.0 / 2000).as("pr")).localCheckpoint()

// ---- serial: k rounds, one barrier each ----
def serial(k: Int): (Double, Int, Double) = {
  val j0 = jobs.get(); val t0 = System.nanoTime()
  var cur = init
  var delta = 0.0
  for (_ <- 1 to k) {
    val next = step(cur).localCheckpoint(false)
    delta = next.agg(max(abs(col("pr") - col("prev")))).head.getDouble(0)
    cur = next.select("x", "pr")
  }
  ((System.nanoTime() - t0) / 1e9, jobs.get() - j0, delta)
}

// ---- unrolled: k rounds chained, one tagged-delta probe ----
def unrolled(k: Int): (Double, Int, Double) = {
  val j0 = jobs.get(); val t0 = System.nanoTime()
  var cur: DataFrame = init
  val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  for (i <- 1 to k) {
    val next = if (i == k) step(cur).localCheckpoint(false) else step(cur)
    frames += next
    cur = next.select("x", "pr")
  }
  val deltas = frames.zipWithIndex.map { case (f, i) =>
    f.agg(max(abs(col("pr") - col("prev"))).as("d")).select(lit(i + 1).as("i"), col("d"))
  }.reduce(_ unionAll _).collect().sortBy(_.getInt(0)).map(_.getDouble(1))
  ((System.nanoTime() - t0) / 1e9, jobs.get() - j0, deltas.last)
}

// plan check: count Exchange vs ReusedExchange in the unrolled probe plan
{
  var cur: DataFrame = init
  val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  for (i <- 1 to 4) { val next = step(cur); frames += next; cur = next.select("x", "pr") }
  val probe = frames.zipWithIndex.map { case (f, i) =>
    f.agg(max(abs(col("pr") - col("prev"))).as("d")).select(lit(i + 1).as("i"), col("d"))
  }.reduce(_ unionAll _)
  val plan = probe.queryExecution.executedPlan.toString
  val nEx = "(?m)^.*\\bExchange\\b".r.findAllIn(plan).size
  val nRe = "ReusedExchange".r.findAllIn(plan).size
  println(s"UNROLL-PLAN exchanges=$nEx reused=$nRe planLines=${plan.linesIterator.size}")
}

// warm
serial(4); unrolled(4)
for (rep <- 1 to 3) {
  val (ts, js, ds) = serial(8)
  val (tu, ju, du) = unrolled(8)
  println(f"REP$rep serial8: ${ts}%.3f s, $js jobs, delta=$ds%.6e | unrolled8: ${tu}%.3f s, $ju jobs, delta=$du%.6e")
}
// deeper unroll
for (k <- Seq(4, 6, 8, 12)) {
  val (tu, ju, du) = unrolled(k)
  println(f"UNROLL k=$k%2d: ${tu}%.3f s, $ju jobs, delta=$du%.6e")
}
System.exit(0)
