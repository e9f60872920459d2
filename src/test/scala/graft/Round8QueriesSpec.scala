package graft

import graft.ops.PipelineCache

/** Mathematical invariants of the round-8 operators — properties the
  * oracle gate cannot express: DuckDB equality proves both engines
  * compute the SAME number, these pin that the number satisfies the
  * definition it claims (a correlation in [-1,1], an entropy under
  * ln k, a silhouette in [-1,1], conservation laws between related
  * queries). Runs at sf0.001 like the rest of the suite.
  */
class Round8QueriesSpec extends SparkTestBase {

  private def rows(q: String) = {
    val out = SparkEntry.queries(q)(spark, sfDir).collect()
    PipelineCache.releaseAll()
    out
  }

  test("pairwise correlations are valid Pearson r over all 6 pairs") {
    val rs = rows("stat_pairwise_corr")
    assert(rs.length == 6)
    rs.foreach { r =>
      val v = r.getDouble(r.fieldIndex("r"))
      assert(v >= -1.0 && v <= 1.0, s"${r.getString(0)}: $v outside [-1,1]")
    }
  }

  test("assortativity is a valid correlation coefficient") {
    val r = rows("graph_assortativity").head
    val v = r.getDouble(r.fieldIndex("assortativity"))
    assert(v >= -1.0 && v <= 1.0, s"assortativity $v outside [-1,1]")
  }

  test("silhouette scores lie in [-1, 1] for every label") {
    rows("sim_silhouette").foreach { r =>
      val v = r.getDouble(r.fieldIndex("mean_silhouette"))
      assert(v >= -1.0 && v <= 1.0, s"label ${r.get(0)}: $v outside [-1,1]")
    }
  }

  test("HHI sits in (1/n, 1] and dominates the squared top share") {
    rows("agg_hhi_concentration").foreach { r =>
      val n = r.getLong(r.fieldIndex("n_suppliers")).toDouble
      val hhi = r.getDouble(r.fieldIndex("hhi"))
      val top = r.getDouble(r.fieldIndex("top_share"))
      assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9,
        s"nation ${r.get(0)}: hhi $hhi outside [1/$n, 1]")
      assert(top <= 1.0 + 1e-9 && top * top <= hhi + 1e-9,
        s"nation ${r.get(0)}: top_share $top inconsistent with hhi $hhi")
    }
  }

  test("entropy is bounded by ln(k) and non-negative") {
    rows("agg_entropy_by_group").foreach { r =>
      val k = r.getLong(r.fieldIndex("n_priorities")).toDouble
      val h = r.getDouble(r.fieldIndex("entropy_nats"))
      assert(h >= -1e-9 && h <= math.log(k) + 1e-9,
        s"status ${r.get(0)}: entropy $h outside [0, ln($k)]")
    }
  }

  test("burstiness is a valid (sd-mu)/(sd+mu) in [-1, 1]") {
    rows("time_burstiness").foreach { r =>
      val b = r.fieldIndex("burstiness")
      if (!r.isNullAt(b))
        assert(r.getDouble(b) >= -1.0 && r.getDouble(b) <= 1.0,
          s"type ${r.get(0)}: burstiness ${r.getDouble(b)} outside [-1,1]")
    }
  }

  test("hapax counts are nested: hapax <= vocab <= total tokens") {
    rows("text_hapax_ratio").foreach { r =>
      val hapax = r.getLong(r.fieldIndex("hapax_count"))
      val vocab = r.getLong(r.fieldIndex("vocab_size"))
      val total = r.getLong(r.fieldIndex("total_tokens"))
      assert(hapax <= vocab && vocab <= total,
        s"lang ${r.get(0)}: $hapax / $vocab / $total not nested")
    }
  }

  test("tokenizer fertility is at least 1 (a word is at least one subword)") {
    rows("text_tokenizer_fertility").foreach { r =>
      assert(r.getDouble(r.fieldIndex("fertility")) >= 1.0,
        s"lang ${r.get(0)} fertility below 1")
    }
  }

  test("duplicate profile conserves the corpus: sum(n_docs) = |documents|") {
    val total = rows("dedup_duplicate_profile")
      .map(_.getLong(1).toInt).sum // n_clusters is col 1? use field index
    val byName = rows("dedup_duplicate_profile")
      .map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    val corpus = graft.ops.Tables.documents(spark, sfDir).count()
    assert(byName == corpus, s"profile covers $byName of $corpus docs")
    assert(total >= 1)
  }

  test("token budget packing never exceeds the budget and reports it exactly") {
    rows("curation_token_budget_pack").foreach { r =>
      val used = r.getLong(r.fieldIndex("budget_used"))
      val kept = r.getLong(r.fieldIndex("tokens_kept"))
      assert(used <= 20000L, s"lang ${r.get(0)} over budget: $used")
      assert(used == kept, s"lang ${r.get(0)}: max cumsum $used != sum $kept")
    }
  }

  test("seeded Bernoulli sampling is reproducible and near p = 0.1") {
    val a = rows("sample_bernoulli_seeded").map(_.toString).sorted.toSeq
    val b = rows("sample_bernoulli_seeded").map(_.toString).sorted.toSeq
    assert(a == b, "membership changed between runs")
    val sampled = rows("sample_bernoulli_seeded")
      .map(r => r.getLong(r.fieldIndex("n_sampled"))).sum.toDouble
    val corpus = graft.ops.Tables.documents(spark, sfDir).count().toDouble
    // loose 3-sigma-ish band for p=0.1 at fixture size
    assert(sampled / corpus > 0.04 && sampled / corpus < 0.18,
      s"sample rate ${sampled / corpus} implausible for p=0.1")
  }

  test("2-hop neighborhoods contain the 1-hop neighborhoods") {
    rows("graph_2hop_card").foreach { r =>
      assert(r.getLong(r.fieldIndex("n_2hop")) >=
        r.getLong(r.fieldIndex("n_1hop")),
        s"vertex ${r.get(0)}: 2-hop smaller than 1-hop")
    }
  }

  test("band stats' pair budget bounds the distinct candidate count") {
    // Σ k(k−1)/2 over band buckets counts each candidate pair once per
    // shared band — an upper bound on the DISTINCT pair count the
    // candidate join (and the histogram over it) actually emits
    val budget = rows("dedup_minhash_band_stats")
      .map(r => r.getLong(r.fieldIndex("n_cand_pairs"))).sum
    val distinctPairs = rows("dedup_jaccard_histogram")
      .map(r => r.getLong(r.fieldIndex("n_pairs"))).sum
    assert(distinctPairs <= budget,
      s"$distinctPairs distinct pairs exceed the $budget band budget")
    assert(distinctPairs > 0, "fixture should produce LSH candidates")
  }

  test("seasonal indexes average to exactly 1 when weighted by day counts") {
    val rs = rows("time_seasonal_index")
    val totDays = rs.map(r => r.getLong(r.fieldIndex("n_days"))).sum.toDouble
    val weighted = rs.map { r =>
      r.getLong(r.fieldIndex("n_days")) *
        r.getDouble(r.fieldIndex("seasonal_index"))
    }.sum
    // index = (srev/n)/(tot/totDays): Σ n·index = totDays by identity;
    // the 9-dp rounding of each index leaves ~1e-6 slack at worst
    assert(math.abs(weighted / totDays - 1.0) < 1e-6,
      s"weighted mean index ${weighted / totDays} != 1")
  }
}
