package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

/** Spark-side plumbing tests for the multimodal stages (schema, batch
  * shape, determinism); the decode itself is a documented deterministic
  * stub. */
class MultimodalSpec extends SparkTestBase {

  import Multimodal._

  private def mediaDs = {
    import spark.implicits._
    spark.createDataset((1L to 20L).map { id =>
      MediaRow(id,
        MediaMeta("image", width = 8 + (id % 4).toInt * 4, height = 8, n_frames = 6, sample_rate = 0),
        Array.fill((id % 7).toInt + 3)(id.toByte))
    }).repartition(4) // multiple partitions: per-partition init path is real
  }

  test("imageFeatures: one output row per media, histogram sums to pixel count") {
    val feats = imageFeatures(mediaDs).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.histogram.sum == f.width * f.height)
      assert(f.mean_intensity >= 0 && f.mean_intensity <= 255)
    }
  }

  test("imageFeatures is deterministic across runs and partitionings") {
    import spark.implicits._
    val a = imageFeatures(mediaDs).collect().sortBy(_.media_id)
    val b = imageFeatures(mediaDs.repartition(1)).collect().sortBy(_.media_id)
    assert(a.map(_.mean_intensity).toSeq == b.map(_.mean_intensity).toSeq)
    assert(a.map(_.histogram.toSeq).toSeq == b.map(_.histogram.toSeq).toSeq)
  }

  test("resize pools dimensions down and keeps ids") {
    val out = resize(mediaDs, 2).collect().sortBy(_.media_id)
    assert(out.length == 20)
    out.foreach { m =>
      assert(m.meta.width >= 1 && m.meta.height == 4)
      assert(m.content.length == m.meta.width * m.meta.height)
    }
  }

  test("sampleFrames fans out every Nth frame as its own row") {
    val frames = sampleFrames(mediaDs, 2).collect()
    // 6 frames sampled every 2 → frames 0,2,4 per media
    assert(frames.length == 20 * 3)
    assert(frames.map(_.frame_idx).distinct.sorted.toSeq == Seq(0, 2, 4))
    frames.foreach(f => assert(f.content.nonEmpty))
  }

  test("binaryMeta stays codegen (no decode) and matches byte lengths") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "")).toDF("id", "txt")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.encode(
          org.apache.spark.sql.functions.col("txt"), "UTF-8").as("content"))
    val meta = binaryMeta(df, "content").collect().sortBy(_.getLong(0))
    assert(meta(0).getAs[Long]("n_bytes") == 3L)
    assert(meta(1).getAs[Long]("n_bytes") == 0L)
    // expression-only stage: no object-boundary operators in the plan
    val plan = binaryMeta(df, "content").queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("SerializeFromObject"))
  }
}
