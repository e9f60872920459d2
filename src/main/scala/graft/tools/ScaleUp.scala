package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up: replicates an existing `sf*` directory
  * `rep`× with per-replica key offsets, producing a larger corpus with the
  * same distributional shape for scaling experiments (BASELINE.md scaling
  * table). This is a measurement tool, not part of the query surface.
  *
  * Design notes (what "same shape at 10×" means here):
  *   - Every synthetic key domain (custkey/suppkey/partkey/orderkey/
  *     event_id/user_id/doc_id/vec_id) is < 10^6, so replica `r` adds
  *     `r * 1_000_000` to each key column. Applying the same offset to both
  *     sides of every FK preserves referential integrity exactly, so join
  *     selectivities are unchanged while key cardinalities grow rep×.
  *   - `nation`/`region` are dimensions: copied once, nationkeys untouched,
  *     so dimension-grouped aggregates see rep× larger groups (the correct
  *     100 TB shape: facts grow, dims don't).
  *   - `documents.text` is letter-rotated per replica (length-preserving
  *     `translate`; vowel rotation composed with a consonant rotation —
  *     combined period 105). Without this, every doc would gain exact
  *     cross-replica clones and LSH/minhash candidate sets would grow
  *     quadratically in rep for data reasons, not plan reasons; rotation
  *     keeps near-dup structure within a replica and makes cross-replica
  *     shingle sets disjoint.
  *   - `embeddings.embedding` is cyclically shifted by `r` positions:
  *     norms and intra-replica geometry are preserved; cross-replica
  *     cosine structure is decorrelated so ANN candidate counts scale
  *     linearly.
  *   - Timestamps are untouched: the time axis does not grow with corpus
  *     size, so per-bucket densities grow rep× (what a busier system at
  *     the same wall-clock span looks like).
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> [rep=10]
  */
object ScaleUp {
  private val KeyBase = 1000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val rep = if (args.length > 2) args(2).toInt else 10
    // The embedding decorrelation below composes a 64-period cyclic
    // shift with a sign flip per 64-replica wrap — a 128-replica period
    // total: replicas r and r+128 get identical shift AND sign, i.e.
    // byte-duplicate vectors past rep=128 (same bound class as the
    // documents rotation's period 105). Refuse rather than silently
    // reintroduce clones.
    require(rep <= 128,
      s"rep=$rep exceeds the 128-replica embedding decorrelation period " +
        "(shift period 64 x sign period 2); add a third norm-preserving " +
        "transform before scaling further")
    val spark = SparkSession.builder()
      .appName("graft-scaleup")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(name: String): DataFrame = graft.ops.Tables.byName(spark, src, name)

    def replicate(name: String, keyCols: Seq[String],
                  extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = table(name)
      val copies = (0 until rep).map { r =>
        val offset = keyCols.foldLeft(base) { (d, k) =>
          d.withColumn(k, col(k) + lit(r * KeyBase))
        }
        extra(offset, r).select(base.columns.map(col): _*)
      }
      copies.reduce(_ unionAll _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
      println(s"scaled $name x$rep")
    }

    // Dimensions: copy once, unchanged.
    Seq("region", "nation").foreach { name =>
      table(name).write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
    }

    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))

    // Letter rotation per replica: deterministic, length-preserving, makes
    // cross-replica shingles disjoint while keeping within-replica near-dup
    // structure identical to the source corpus. The transform COMPOSES a
    // vowel rotation (period 5) with a consonant rotation advanced every 5
    // replicas (period 21), so the combined period is 105 ≥ any sensible
    // rep — the round-6 form used vowels alone, so replicas r and r+5
    // produced byte-identical text and every doc gained one exact
    // cross-replica clone, inflating LSH candidate structure for data
    // reasons (round-6 advice).
    val lower = "aeiou"; val upper = "AEIOU"
    val consL = "bcdfghjklmnpqrstvwxyz"; val consU = consL.toUpperCase
    val alphabet = lower + upper + consL + consU
    def rotated(s: String, k: Int): String = s.drop(k) + s.take(k)
    replicate("documents", Seq("doc_id"), (d, r) => {
      val kv = r % 5
      val kc = (r / 5) % consL.length
      val rot = rotated(lower, kv) + rotated(upper, kv) +
        rotated(consL, kc) + rotated(consU, kc)
      d.withColumn("text", translate(col("text"), alphabet, rot))
    })

    // Cyclic element shift per replica: preserves norms, decorrelates
    // cross-replica cosine structure. The shift alone has only dim (64)
    // distinct values, so past 64 replicas it would byte-duplicate
    // earlier replicas' vectors and inflate ANN/near-dup candidates for
    // data reasons (the round-6 clone lesson again, one level up) —
    // each 64-replica wrap therefore also flips the sign (norm-
    // preserving; cosine(x, −x) = −1, so wrapped replicas are maximally
    // far from their shift-twins, not clones). rep ≤ 64 is unchanged.
    // The composition's period is 128 (shift 64 × sign 2) — enforced by
    // the require() in main; r and r+128 would be byte-identical.
    replicate("embeddings", Seq("vec_id"), (d, r) => {
      val shifted =
        if (r == 0) d
        else d.withColumn("embedding",
          expr(s"concat(slice(embedding, ${r % 64 + 1}, size(embedding)), " +
               s"slice(embedding, 1, ${r % 64}))"))
      if ((r / 64) % 2 == 0) shifted
      else shifted.withColumn("embedding",
        expr("transform(embedding, x -> -x)"))
    })

    spark.stop()
  }
}
