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
    // Decorrelation periods (round 14, r13 verdict #5 — the old 128
    // cap blocked the sf30+ scaling evidence): the documents transform
    // is vowel-rot(5) × consonant-rot(21) × case-swap(2) × reversal(2)
    // = period 420; the embeddings transform is cyclic-shift(64) ×
    // sign-flip(2) × out-shuffle-permutation(order 6 on 64 elements)
    // = period 768. Replicas r and r+420 would get byte-identical
    // TEXT transforms — exact cross-replica clones that inflate
    // dedup/LSH candidates for data reasons, not plan reasons (the
    // round-6 lesson). Refuse rather than silently reintroduce them.
    require(rep <= 420,
      s"rep=$rep exceeds the 420-replica documents decorrelation period " +
        "(vowel 5 x consonant 21 x case 2 x reversal 2); add another " +
        "structure-preserving transform before scaling further")
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
    // Round-14 extension for rep > 105 (r13 verdict #5): compose a
    // CASE SWAP at each 105-replica wrap and a STRING REVERSAL at each
    // 210-replica wrap — both length-preserving bijections on the doc,
    // so within-replica near-dup structure (pairwise shingle Jaccard)
    // is exactly preserved while cross-replica shingle sets stay
    // disjoint out to 420 replicas. (The corpus text has no digits —
    // measured — so a digit rotation would be a no-op, not a period
    // extension.) The case swap folds into the same single translate
    // (swap the case of the rotation target); the reversal is one
    // `reverse(text)` on top.
    val lower = "aeiou"; val upper = "AEIOU"
    val consL = "bcdfghjklmnpqrstvwxyz"; val consU = consL.toUpperCase
    val alphabet = lower + upper + consL + consU
    def rotated(s: String, k: Int): String = s.drop(k) + s.take(k)
    replicate("documents", Seq("doc_id"), (d, r) => {
      val kv = r % 5
      val kc = (r / 5) % consL.length
      val rot0 = rotated(lower, kv) + rotated(upper, kv) +
        rotated(consL, kc) + rotated(consU, kc)
      val rot = if ((r / 105) % 2 == 0) rot0
        else rot0.map(c => if (c.isUpper) c.toLower else c.toUpper)
      val translated = d.withColumn("text", translate(col("text"), alphabet, rot))
      if ((r / 210) % 2 == 0) translated
      else translated.withColumn("text", reverse(col("text")))
    })

    // Cyclic element shift per replica: preserves norms, decorrelates
    // cross-replica cosine structure. The shift alone has only dim (64)
    // distinct values, so past 64 replicas it would byte-duplicate
    // earlier replicas' vectors and inflate ANN/near-dup candidates for
    // data reasons (the round-6 clone lesson again, one level up) —
    // each 64-replica wrap therefore also flips the sign (norm-
    // preserving; cosine(x, −x) = −1, so wrapped replicas are maximally
    // far from their shift-twins, not clones). rep ≤ 64 is unchanged.
    // Round 14, each 128-replica wrap additionally applies the k-th
    // power of the OUT-SHUFFLE permutation (perfect riffle: new[2i] =
    // old[i], new[2i+1] = old[32+i]) — a norm-preserving permutation of
    // multiplicative order 6 on 64 elements (2⁶ ≡ 1 mod 63), extending
    // the composed period to shift 64 × sign 2 × shuffle 6 = 768 —
    // r = 128k + 64s + j is bijective onto (shift j, sign s, shuffle k),
    // so no two replicas under 768 share a transform. Enforced by the
    // (tighter, documents-side) require() in main.
    val outShuffle: Vector[Int] =
      Vector.tabulate(64)(j => if (j % 2 == 0) j / 2 else 32 + j / 2)
    def shufflePow(k: Int): Vector[Int] =
      (0 until k).foldLeft(Vector.tabulate(64)(identity)) { (p, _) =>
        Vector.tabulate(64)(j => p(outShuffle(j)))
      }
    replicate("embeddings", Seq("vec_id"), (d, r) => {
      val shifted =
        if (r % 64 == 0) d
        else d.withColumn("embedding",
          expr(s"concat(slice(embedding, ${r % 64 + 1}, size(embedding)), " +
               s"slice(embedding, 1, ${r % 64}))"))
      val signed =
        if ((r / 64) % 2 == 0) shifted
        else shifted.withColumn("embedding",
          expr("transform(embedding, x -> -x)"))
      val k = (r / 128) % 6
      if (k == 0) signed
      else {
        val perm = shufflePow(k)
        signed.withColumn("embedding",
          array(perm.map(p => element_at(col("embedding"), p + 1)): _*))
      }
    })

    spark.stop()
  }
}
