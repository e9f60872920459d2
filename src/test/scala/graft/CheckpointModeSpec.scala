package graft

import graft.ops.{Checkpoints, PipelineCache}

/** r13 verdict #4: the convergence loops' lineage cuts are
  * `localCheckpoint` by default (correct and cheapest on local[N]) and
  * reliable `checkpoint` into a directory when the
  * `spark.graft.checkpointDir` gate is set (what a 1000-executor run
  * needs — an executor loss mid-loop recovers by re-reading instead of
  * failing a lineage-truncated job). A checkpoint only moves WHERE a
  * round's frame is materialized, never its rows — both modes must
  * produce byte-identical fixpoints, and the default must not write a
  * checkpoint directory at all. */
class CheckpointModeSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  private def rows(name: String, d: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, d).collect().toSeq.map(_.toSeq)

  test("reliable-checkpoint mode reproduces the default-mode fixpoints exactly") {
    // one loop from each family, at the sf0.01 corpus (the verdict's
    // prescribed scale) — CC fixpoint + PageRank convergence exercise
    // eager and lazy cuts plus the warm-start path
    val qs = Seq("dedup_cluster_converged", "graph_pagerank_converged")
    val cpBefore = spark.sparkContext.getCheckpointDir
    PipelineCache.releaseAll()
    val defaults = qs.map(rows(_, sf01))
    PipelineCache.releaseAll()
    // default behavior unchanged: no checkpoint dir appeared, so every
    // cut in the default runs was a localCheckpoint
    assert(spark.sparkContext.getCheckpointDir == cpBefore,
      "default mode must not set a checkpoint directory")
    val dir = java.nio.file.Files.createTempDirectory("graft-cp").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val reliable = qs.map(rows(_, sf01))
      assert(reliable == defaults,
        "reliable checkpointing must not change any fixpoint row")
      // and the reliable path actually ran: checkpoint data landed in
      // the gated directory
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val n = try wrote.count() finally wrote.close()
      assert(n > 1, s"no checkpoint data written under $dir")
    } finally {
      spark.conf.unset(Checkpoints.ConfKey)
      PipelineCache.releaseAll()
    }
  }
}
