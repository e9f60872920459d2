// Variant B: chain k rounds with PER-ROUND LAZY localCheckpoint (plan
// truncated immediately, blocks materialized by the one probe job at
// the segment boundary). Compare against serial (1 barrier/round).
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

// Variant B: every round lazily checkpointed; ONE probe action per segment.
def unrolledB(k: Int): (Double, Int, Double) = {
  val j0 = jobs.get(); val t0 = System.nanoTime()
  var cur: DataFrame = init
  val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  for (i <- 1 to k) {
    val next = step(cur).localCheckpoint(false)
    frames += next
    cur = next.select("x", "pr")
  }
  val deltas = frames.zipWithIndex.map { case (f, i) =>
    f.agg(max(abs(col("pr") - col("prev"))).as("d")).select(lit(i + 1).as("i"), col("d"))
  }.reduce(_ unionAll _).collect().sortBy(_.getInt(0)).map(_.getDouble(1))
  ((System.nanoTime() - t0) / 1e9, jobs.get() - j0, deltas.last)
}

// warm
serial(4); unrolledB(4)
for (rep <- 1 to 3) {
  val (ts, js, ds) = serial(8)
  val (tu, ju, du) = unrolledB(8)
  println(f"REP$rep serial8: ${ts}%.3f s, $js jobs, d=$ds%.6e | unrolledB8: ${tu}%.3f s, $ju jobs, d=$du%.6e")
}
for (k <- Seq(4, 8, 12, 16)) {
  val (tu, ju, du) = unrolledB(k)
  println(f"UNROLLB k=$k%2d: ${tu}%.3f s, $ju jobs, d=$du%.6e")
}
for (k <- Seq(8, 16)) {
  val (ts, js, ds) = serial(k)
  println(f"SERIAL  k=$k%2d: ${ts}%.3f s, $js jobs, d=$ds%.6e")
}
System.exit(0)
