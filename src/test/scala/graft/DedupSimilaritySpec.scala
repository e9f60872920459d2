package graft

import org.apache.spark.sql.Row
import graft.ops.{DedupQueries, SimilarityQueries}

/** Correctness of the sub-quadratic near-dup pipelines and ANN queries
  * (the DuckDB oracle is the primary gate; these pin algorithm-level
  * invariants the oracle can't express). */
class DedupSimilaritySpec extends SparkTestBase {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH and prefix-filter joins find the same pair set") {
    val lsh = pairs("dedup_minhash_lsh")
    val pre = pairs("dedup_prefix_jaccard")
    // prefix filtering is exact (full recall); LSH ⊆ exact always,
    // and on this corpus the banding recall is complete.
    assert(lsh.nonEmpty)
    assert(lsh == pre, s"LSH=${lsh.size} prefix=${pre.size}")
  }

  test("planted near-duplicate pair is detected by all three text pipelines") {
    // doc pair (474, 498) has 3-shingle Jaccard ≈ 0.989 at sf0.001
    assert(pairs("dedup_minhash_lsh").contains((474L, 498L)))
    assert(pairs("dedup_prefix_jaccard").contains((474L, 498L)))
    assert(pairs("dedup_simhash").contains((474L, 498L)))
  }

  test("simhash pairs are symmetric-free and ordered a<b") {
    val p = pairs("dedup_simhash")
    assert(p.forall { case (a, b) => a < b })
  }

  test("embedding near-dup pairs stay within label blocks") {
    val rows = SparkEntry.queries("dedup_embedding_cosine")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("cos") >= 0.35))
  }

  test("brute-force topk is a superset-ranking of the LSH-bucketed topk") {
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(brute.length == 10)
    // descending, tie-broken
    assert(brute.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
    val lsh = SparkEntry.queries("sim_lsh_bucket_topk")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("cos")).toMap
    assert(lsh.nonEmpty && lsh.size <= 5)
    // the bucketed search scores with the same metric: any id in both
    // result sets must carry the identical cosine
    val bruteMap = brute.toMap
    lsh.foreach { case (id, c) =>
      bruteMap.get(id).foreach(bc => assert(bc == c, s"cos mismatch for $id"))
    }
  }

  test("IVF multi-probe results carry brute-force-identical cosines") {
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = SparkEntry.queries("sim_ivf_coarse_topk")(spark, sfDir).collect()
    assert(ivf.length == 5)
    // any IVF hit that brute-force also ranked must have the same cosine
    ivf.foreach { r =>
      brute.get(r.getLong(0)).foreach(bc => assert(bc == r.getDouble(2)))
    }
  }

  test("knn per label returns exactly 3 neighbors for every label") {
    val rows = SparkEntry.queries("sim_knn_per_label")(spark, sfDir).collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    assert(byLabel.size == 10)
    assert(byLabel.values.forall(_.length == 3))
  }

  test("candidate joins broadcast-or-shuffle on derived keys, never cross product") {
    val plan = DedupQueries.dedupMinhashLsh(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cross product in:\n$plan")
  }

  test("cluster labels stay within true connected components and point at member ids") {
    val edgeSet = pairs("dedup_minhash_lsh")
    // ground truth: union-find over the (small) collected pair set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edgeSet.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val labels = SparkEntry.queries("dedup_cluster_labels")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    labels.foreach { case (id, lbl) =>
      assert(lbl <= id, s"label must be a min-propagated id: $id -> $lbl")
      assert(labels.contains(lbl), s"label $lbl of $id is not a member doc")
      // propagation only travels along edges: never cross true components
      assert(find(lbl) == find(id), s"$id labeled across components: $lbl")
    }
    // the planted duplicates give at least one multi-member cluster
    assert(labels.groupBy(_._2).exists(_._2.size > 1))
  }

  test("converged cluster labels equal union-find components exactly") {
    val edgeSet = pairs("dedup_minhash_lsh")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edgeSet.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    // canonical truth: every node labeled by the MIN id of its component
    val members = parent.keys.toSeq
    val minOfRoot = members.groupBy(find).map { case (r, ms) => r -> ms.min }
    val truth = members.map(id => id -> minOfRoot(find(id))).toMap
    val got = SparkEntry.queries("dedup_cluster_converged")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == truth, "fixpoint propagation must equal union-find components")
  }

  test("embedding near-dup pair set is invariant in the cell count m") {
    import graft.ops.PipelineCache
    def pairs(m: Int): Seq[(Long, Long)] = {
      val r = DedupQueries.dedupEmbeddingCosineCells(spark, sfDir, m)
        .select("a_id", "b_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq
      PipelineCache.releaseAll() // each m caches its own replicated base
      r
    }
    val m4 = pairs(4) // the sf0.001 runtime-derived value (floor)
    assert(m4.nonEmpty)
    assert(pairs(1) == m4)  // m=1: no replication, one cell-pair per label
    assert(pairs(7) == m4)  // m=7: a non-divisor of the label sizes
    // the SHIPPED query (runtime-derived m) produces the same pair set
    val rt = SparkEntry.queries("dedup_embedding_cosine")(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    PipelineCache.releaseAll()
    assert(rt == m4)
  }

  test("embedding cell counts track the corpus label histogram PER LABEL") {
    // driver-side expectation from the actual histogram...
    val hist = graft.ops.Tables.embeddings(spark, sfDir)
      .groupBy("label").count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    assert(hist.nonEmpty)
    // ...must equal the distributed per-label derivation the query uses,
    // label for label (round 13: one row per label, not one global max)
    val mRows = DedupQueries.embedCellFrame(spark, sfDir).collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    assert(mRows.keySet == hist.keySet)
    hist.foreach { case (lbl, n) =>
      assert(mRows(lbl) == DedupQueries.embedCellCount(n),
        s"label $lbl: derived m=${mRows(lbl)} != sizing rule for $n rows")
    }
    // the sizing arithmetic itself: floor below target, ceil-linear above
    assert(DedupQueries.embedCellCount(1) == 4L)
    assert(DedupQueries.embedCellCount(250) == 4L)   // sf0.01-scale labels
    assert(DedupQueries.embedCellCount(8192) == 4L)  // 4 cells of 2048
    assert(DedupQueries.embedCellCount(8193) == 5L)
    assert(DedupQueries.embedCellCount(1000000) == 489L)
  }

  test("per-label cell counts keep the pair set exact on a SKEWED histogram") {
    // The cover proof is per-label: both rows of a candidate pair share
    // a label, hence the same m, so labels may replicate with DIFFERENT
    // m and the union of per-label covers is still exhaustive. Pin that
    // directly: attach a deliberately non-uniform m (3 vs 7 by label
    // parity — non-divisors of each other and of the label sizes) and
    // the pair set must equal both the naive within-label self-join
    // baseline (uniform m = 1) and a uniform m = 4.
    import org.apache.spark.sql.functions.{col, lit, pmod, when}
    import graft.ops.PipelineCache
    val base = graft.ops.Tables.embeddings(spark, sfDir)
    def pairsOf(mCol: org.apache.spark.sql.Column): Seq[(Long, Long)] = {
      val r = DedupQueries.embedPairs(
        DedupQueries.embedReplicate(base.withColumn("m", mCol)))
        .select("a_id", "b_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq
      PipelineCache.releaseAll()
      r
    }
    val naive = pairsOf(lit(1L))
    assert(naive.nonEmpty)
    assert(pairsOf(lit(4L)) == naive)
    val skewed = when(pmod(col("label").cast("long"), lit(2L)) === 0L, lit(3L))
      .otherwise(lit(7L))
    assert(pairsOf(skewed) == naive,
      "per-label m must not change the pair set")
  }

  test("semantic-cell pair set is invariant in the sub-cell count m") {
    // r13 verdict #2: the per-label triangle-cell machinery composed
    // into the quantizer-cell join. The cover proof is per coarse cell
    // (both rows of a pair share a cell, hence an m), so any m ≥ 1 —
    // uniform or per-cell skewed — must produce the naive within-cell
    // self-join's exact pair set; only task bounds move.
    import org.apache.spark.sql.functions.{col, lit, pmod, when}
    val assigned = SimilarityQueries.coarseAssigned(spark, sfDir, 64L)
    def pairsOf(mCol: org.apache.spark.sql.Column): Set[(Long, Long)] =
      SimilarityQueries.cellPairs(
        SimilarityQueries.cellReplicate(assigned.withColumn("m", mCol)))
        .filter(col("cos") >= SimilarityQueries.SemTau)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pairsOf(lit(1L)) // m=1: no replication, plain cell join
    assert(naive.nonEmpty)
    assert(pairsOf(lit(4L)) == naive)
    assert(pairsOf(lit(7L)) == naive) // non-divisor of the cell sizes
    val skewed = when(pmod(col("cell"), lit(2L)) === 0L, lit(3L))
      .otherwise(lit(7L))
    assert(pairsOf(skewed) == naive,
      "per-cell m must not change the pair set")
    // the SHIPPED query (runtime-derived per-cell m) matches
    assert(pairs("dedup_semantic_cells") == naive,
      "shipped runtime-m query must equal the naive baseline")
  }

  test("ivf batch-kNN top-3 is invariant in the sub-cell count m") {
    // same composition for the ordered-pair (kNN) consumer: unordered
    // sub-cell pairs mirrored into both directions must reproduce the
    // old a≠b within-cell join's ranking for any m.
    import org.apache.spark.sql.functions.{col, lit, row_number}
    import org.apache.spark.sql.expressions.Window
    val assigned = SimilarityQueries.coarseAssigned(spark, sfDir, 8L)
    def top3(mCol: org.apache.spark.sql.Column): Seq[(Long, Int, Long)] = {
      val und = SimilarityQueries.cellPairs(
        SimilarityQueries.cellReplicate(assigned.withColumn("m", mCol)))
      val prs = und
        .select(col("a_id").as("q_id"), col("b_id").as("nbr_id"), col("cos"))
        .unionAll(und
          .select(col("b_id").as("q_id"), col("a_id").as("nbr_id"), col("cos")))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id"))
      prs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select("q_id", "rk", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    }
    val naive = top3(lit(1L))
    assert(naive.nonEmpty)
    assert(top3(lit(5L)) == naive)
    val shipped = SparkEntry.queries("sim_knn_batch_ivf")(spark, sfDir)
      .select("q_id", "rk", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    graft.ops.PipelineCache.releaseAll()
    assert(shipped == naive,
      "shipped runtime-m kNN must equal the naive baseline")
  }

  test("full-probe IVF (nProbe = nCells) equals exact brute-force top-k") {
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.take(5) // brute is top-10
    val full = graft.ops.SimilarityQueries
      .simIvfCoarseTopkCells(spark, sfDir, nCells = 4, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == brute) // scanning every cell removes the approximation
  }

  test("CC loop converges well before the round cap; cap trip warns loudly") {
    import graft.ops.PipelineCache
    val (df, rounds, converged) =
      DedupQueries.ccConvergedWithStats(spark, sfDir, DedupQueries.CcMaxRounds)
    assert(df.count() > 0)
    assert(converged, s"fixture graph should converge (rounds=$rounds)")
    assert(rounds < DedupQueries.CcMaxRounds,
      s"fixture should converge before the cap, took $rounds")
    assert(rounds > 1, "fixture graph should need more than one round " +
      "(else the cap-trip test below is vacuous)")
    PipelineCache.releaseAll()
    // cap trip: maxRounds=1 cannot reach the fixture's fixpoint
    val errBuf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    val (_, _, converged1) = try {
      System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
      DedupQueries.ccConvergedWithStats(spark, sfDir, 1)
    } finally System.setErr(realErr)
    assert(!converged1)
    assert(errBuf.toString("UTF-8").contains("reached before convergence"),
      s"expected the cap-trip warning, got: ${errBuf.toString("UTF-8").take(200)}")
    PipelineCache.releaseAll()
  }

  test("k-means step: cell masses cover the table and centroids are finite") {
    val total = graft.ops.Tables.embeddings(spark, sfDir).count()
    val rows = SparkEntry.queries("sim_kmeans_step")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val dims = rows.map(_._2).distinct.sorted.toSeq
    assert(dims == (1L to 64L).toSeq) // 64-dim embeddings
    // every vector lands in exactly one cell: per-dim masses sum to N
    dims.foreach { dim =>
      assert(rows.filter(_._2 == dim).map(_._4).sum == total)
    }
    assert(rows.forall(r => !r._3.isNaN && !r._3.isInfinite))
  }

  test("k-means production sum agrees with the bit-stable ordered fold within ulps") {
    // registered query: plain partial-aggregated sum (the 100 TB plan);
    // fold: members sorted by vec_id, seeded 0.0 — deterministic bridge.
    // Agreement must be far tighter than the registered round(12).
    val sums = SparkEntry.queries("sim_kmeans_step")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val folds = graft.ops.SimilarityQueries.simKmeansStepFold(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sums.nonEmpty && sums.keySet == folds.keySet)
    sums.foreach { case (k, c) =>
      assert(math.abs(c - folds(k)) < 1e-12, s"cell/dim $k: $c vs ${folds(k)}")
    }
  }

  test("int8 quantization: codes bounded, zero clipping only when |x| <= 1") {
    val rows = SparkEntry.queries("sim_quantize_int8")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nDims, nClipped, qSum, l2) =>
      assert(nDims == 64 && nClipped >= 0 && nClipped <= nDims)
      assert(math.abs(qSum) <= 127L * nDims, s"vec $id code checksum out of range")
      // max per-element error is (0.5/127)^2 for in-range values, plus
      // the clipped overshoot — bound loosely but finitely
      assert(l2 >= 0.0 && !l2.isNaN)
      if (nClipped == 0) assert(l2 <= nDims * math.pow(0.5 / 127.0, 2) + 1e-12,
        s"vec $id unclipped error too large: $l2")
    }
  }

  test("shared-passage pairs cover the minhash near-dups and stay pruned") {
    import graft.ops.PipelineCache
    val passages = SparkEntry.queries("dedup_shared_passage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(passages.nonEmpty)
    assert(passages.forall(_._3 >= DedupQueries.PassageMinShared))
    assert(passages.forall(p => p._1 < p._2)) // canonical pair order
    // the planted long near-dup (474, 498) shares ~all of its ~100
    // shingles — it must surface here too (short near-dups can legally
    // fall under the 10-shared threshold; whole-doc Jaccard and passage
    // overlap measure different things)
    val passagePairs = passages.map(p => (p._1, p._2)).toSet
    assert(passagePairs.contains((474L, 498L)), passagePairs.take(10).toString)
    PipelineCache.releaseAll()
  }

  test("cluster-size histogram accounts for every labeled doc") {
    val labeled = SparkEntry.queries("dedup_cluster_converged")(spark, sfDir).count()
    graft.ops.PipelineCache.releaseAll()
    val hist = SparkEntry.queries("dedup_cluster_sizes")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.nonEmpty)
    assert(hist.forall(_._1 >= 2), "a cluster needs at least one pair")
    assert(hist.map { case (sz, n) => sz * n }.sum == labeled,
      s"histogram mass must equal labeled docs: $labeled vs ${hist.toSeq}")
    graft.ops.PipelineCache.releaseAll()
  }

  test("curation funnel only shrinks the per-source budget") {
    val budget = SparkEntry.queries("text_bpe_budget")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // text_bpe_budget emits (source, bpe_tokens, n_docs)
    val funnel = SparkEntry.queries("text_curation_funnel")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // funnel emits (source, n_docs, bpe_tokens)
    assert(funnel.nonEmpty)
    funnel.foreach { case (src, (nDocs, bpe)) =>
      val (allBpe, allDocs) = budget(src)
      assert(nDocs <= allDocs, s"$src: funnel kept more docs than exist")
      assert(bpe <= allBpe, s"$src: funnel kept more tokens than exist")
      assert(nDocs > 0 && bpe > 0)
    }
  }

  test("tf-idf cosine: bounded, planted near-dup found, weighted measure ranks it top") {
    val rows = SparkEntry.queries("text_tfidf_cosine")(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(rows.nonEmpty)
    // cosine of nonnegative-weight vectors: (0, 1] up to rounding slop
    rows.values.foreach(c => assert(c > 0.0 && c <= 1.0 + 1e-9, c))
    // the planted 0.989-Jaccard pair must also be a tf-idf near-dup
    // (exact-duplicate pairs may outrank it at exactly 1.0)
    assert(rows.contains((474L, 498L)), "planted pair missing")
    assert(rows((474L, 498L)) >= 0.9,
      s"planted near-identical pair scored low: ${rows((474L, 498L))}")
  }

  test("LSH recall eval: found is a subset of truth and the counts reconcile") {
    val row = graft.ops.DedupQueries.dedupLshRecallEval(spark, sfDir)
      .collect().head
    val (nT, nF, nM, recall) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    assert(nT > 0 && nF >= 0 && nM == nT - nF)
    assert(recall == nF.toDouble / nT.toDouble)
    assert(recall > 0.0 && recall <= 1.0)
    // subset property, re-derived from the two underlying queries
    val truth = graft.ops.DedupQueries.dedupPrefixJaccard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = graft.ops.DedupQueries.dedupMinhashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truth), s"LSH found pairs outside truth: ${found -- truth}")
    assert(truth.size.toLong == nT && found.size.toLong == nF)
  }

  test("matryoshka rerank: exact cosines, candidates from the coarse stage, " +
      "recall vs brute force measured") {
    val out = graft.ops.SimilarityQueries.simMatryoshkaTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 10)
    out.foreach { case (_, coarse, cos) =>
      assert(coarse >= -1.0 - 1e-9 && coarse <= 1.0 + 1e-9)
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
    }
    // the reranked cosines must agree with the brute-force ranker where
    // the candidate overlaps (sim_cosine_topk uses the same probe)
    val brute = graft.ops.SimilarityQueries.simCosineTopk(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hits = out.count { case (id, _, cos) =>
      brute.get(id).exists(_ == cos)
    }
    // MRL-style recall on random fixtures is imperfect by design; the
    // spec pins that the two-stage result is sane, not lossless
    assert(hits >= 3, s"matryoshka recall@10 vs brute force: $hits/10")
  }

  test("hybrid RRF: scores bounded and consistent with the member ranks, " +
      "both modalities contribute, fusion order correct") {
    val out = graft.ops.SimilarityQueries.simHybridRrf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(out.nonEmpty)
    out.foreach { case (probe, cand, _, rrf, lexR, vecR) =>
      assert(cand != probe)
      // rrf must equal the reciprocal-rank recombination of its parts
      val want = lexR.map(r => 1.0 / (r + 60)).getOrElse(0.0) +
        vecR.map(r => 1.0 / (r + 60)).getOrElse(0.0)
      assert(rrf == want, s"($probe,$cand) rrf $rrf != $want")
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0)
      lexR.foreach(r => assert(r >= 1 && r <= 20))
      vecR.foreach(r => assert(r >= 1 && r <= 20))
    }
    out.groupBy(_._1).foreach { case (probe, rs) =>
      // rk is 1..5 and descending in score with doc_id tiebreak
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
      val byRk = rs.sortBy(_._3)
      byRk.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._2 < b._2),
            s"probe $probe fusion order broken at rk ${b._3}")
        case _ =>
      }
      // a doc ranked by BOTH towers must outscore any single-tower doc
      // at equal ranks — spot the top fused row has both contributions
      // on this corpus (tokens and embeddings are correlated by id)
      assert(rs.exists(r => r._5.isDefined && r._6.isDefined),
        s"probe $probe: no candidate retrieved by both towers")
    }
  }
}
