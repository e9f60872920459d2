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

  // ---- frontier batch (second round-8 wave) ----

  test("AUC is a probability and the rank pass covers every document") {
    val perLang = graft.ops.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows("stat_auc_rank").foreach { r =>
      val np = r.getLong(r.fieldIndex("n_pos"))
      val nn = r.getLong(r.fieldIndex("n_neg"))
      assert(np + nn == perLang(r.getString(0)),
        s"lang ${r.get(0)}: $np+$nn misses documents")
      val i = r.fieldIndex("auc")
      if (!r.isNullAt(i))
        assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0,
          s"lang ${r.get(0)}: auc ${r.getDouble(i)} outside [0,1]")
    }
  }

  test("clustering coefficients are probabilities") {
    val rs = rows("graph_clustering_coeff")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val c = r.getDouble(r.fieldIndex("avg_clustering"))
      assert(c >= 0.0 && c <= 1.0, s"deg ${r.get(0)}: $c outside [0,1]")
      assert(r.getLong(r.fieldIndex("sum_triangles")) >= 0L)
    }
  }

  test("JL distortion histogram conserves the non-degenerate vector count") {
    val binned = rows("sim_jl_distortion")
      .map(r => r.getLong(r.fieldIndex("n_vecs"))).sum
    val total = graft.ops.Tables.embeddings(spark, sfDir).count()
    assert(binned == total, s"histogram covers $binned of $total vectors")
  }

  test("Zipf slope is negative over a head capped at 1000 ranks") {
    rows("text_zipf_slope").foreach { r =>
      assert(r.getLong(r.fieldIndex("n_ranks")) <= 1000L)
      assert(r.getDouble(r.fieldIndex("zipf_slope")) < 0.0,
        s"lang ${r.get(0)}: rank-frequency slope not decreasing")
    }
  }

  test("BPE merge candidates rank by nonincreasing count within language") {
    rows("text_bpe_merge_step").groupBy(_.getString(0)).foreach {
      case (lang, rs) =>
        val byRank = rs.sortBy(_.getLong(rs.head.fieldIndex("rank")))
        val cnts = byRank.map(_.getLong(rs.head.fieldIndex("cnt")))
        assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
          s"lang $lang: counts not sorted: ${cnts.toSeq}")
    }
  }

  test("systematic sample takes exactly ceil(n/k) per stratum, first row in") {
    val perLang = graft.ops.Tables.documents(spark, sfDir)
      .groupBy("lang").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min("doc_id").as("mn"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows("sample_systematic").groupBy(_.getString(0)).foreach {
      case (lang, rs) =>
        val (n, mn) = perLang(lang)
        assert(rs.length == ((n + 9) / 10),
          s"lang $lang: ${rs.length} sampled of $n")
        assert(rs.map(_.getLong(1)).min == mn,
          s"lang $lang: first document not in the sample")
    }
  }

  test("late-arriving dim report conserves the fact table") {
    val rs = rows("etl_late_arriving_dim")
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_resolved")) +
        r.getLong(r.fieldIndex("n_late")) ==
        r.getLong(r.fieldIndex("n_orders")), s"month ${r.get(0)} leaks orders")
    }
    val total = rs.map(r => r.getLong(r.fieldIndex("n_orders"))).sum
    assert(total == graft.ops.Tables.orders(spark, sfDir).count())
  }

  test("changepoint splits are interior and the statistic is nonnegative") {
    rows("time_changepoint_binseg").foreach { r =>
      assert(r.getLong(r.fieldIndex("n_left")) >= 1L)
      assert(r.getLong(r.fieldIndex("n_right")) >= 1L)
      assert(r.getDouble(r.fieldIndex("cusum_stat")) >= 0.0)
    }
  }

  test("Spearman rho is a valid correlation coefficient") {
    // the synthetic generator draws quantity and price independently
    // (unlike TPC-H's qty-proportional pricing), so the EXPECTED value
    // is near zero — the invariant is the bound, and near-zero is
    // itself evidence the rank plumbing isn't leaking association
    rows("stat_spearman_corr").foreach { r =>
      val rho = r.getDouble(r.fieldIndex("spearman_rho"))
      assert(rho >= -1.0 && rho <= 1.0, s"flag ${r.get(0)}: rho $rho")
      assert(math.abs(rho) < 0.2,
        s"flag ${r.get(0)}: independent draws should give near-zero rho, got $rho")
    }
  }

  test("TTR values are valid ratios in (0, 1]") {
    rows("text_ttr_curve").foreach { r =>
      Seq("ttr_50", "ttr_100", "ttr_200").foreach { c =>
        val v = r.getDouble(r.fieldIndex(c))
        assert(v > 0.0 && v <= 1.0, s"lang ${r.get(0)} $c: $v")
      }
    }
  }

  test("Lorenz curve is nondecreasing and ends at exactly 1") {
    val rs = rows("agg_lorenz_points").sortBy(_.getLong(0))
    assert(rs.length == 10)
    val shares = rs.map(r => r.getDouble(r.fieldIndex("cum_share")))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      s"cumulative shares decrease: ${shares.toSeq}")
    assert(shares.last == 1.0, s"final share ${shares.last} != 1")
  }

  test("no Pareto front member dominates another") {
    rows("curation_pareto_front").groupBy(_.getString(0)).foreach {
      case (lang, rs) =>
        val pts = rs.map(r => (r.getLong(r.fieldIndex("n_tokens")),
          r.getLong(r.fieldIndex("n_types"))))
        for (a <- pts; b <- pts if a != b)
          assert(!(a._1 > b._1 && a._2 >= b._2),
            s"lang $lang: $a dominates front member $b")
    }
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

  test("Palma shares are consistent: top + bottom <= 1 and ratio = top/bottom") {
    rows("agg_palma_ratio").foreach { r =>
      val n = r.getLong(r.fieldIndex("n_customers"))
      val top = r.getDouble(r.fieldIndex("top10_share"))
      val bot = r.getDouble(r.fieldIndex("bottom40_share"))
      val palma = r.getDouble(r.fieldIndex("palma_ratio"))
      // nations with < 10 purchasing customers leave decile 10 empty
      // (ntile assigns buckets 1..n) — top is legitimately 0 there
      assert(bot > 0 && top + bot <= 1.0 + 1e-9,
        s"${r.getString(0)}: shares $top/$bot")
      if (n >= 10) assert(top > 0, s"${r.getString(0)}: empty top decile")
      // the ratio is computed from the exact decimals, not the rounded
      // shares — allow the compounded 9-dp rounding
      assert(math.abs(palma - top / bot) < 1e-6,
        s"${r.getString(0)}: palma $palma vs ${top / bot}")
    }
  }

  test("shrunk rates move at most alpha/(n+alpha) from the raw rate") {
    rows("agg_bayes_shrinkage").foreach { r =>
      val n = r.getLong(r.fieldIndex("n")).toDouble
      val raw = r.getDouble(r.fieldIndex("raw_rate"))
      val shr = r.getDouble(r.fieldIndex("shrunk_rate"))
      assert(shr >= 0.0 && shr <= 1.0, s"supplier ${r.get(0)}: $shr")
      // |shrunk - raw| = alpha|g - raw|/(n+alpha) <= alpha/(n+alpha)
      assert(math.abs(shr - raw) <= 20.0 / (n + 20.0) + 1e-9,
        s"supplier ${r.get(0)}: |$shr - $raw| > bound")
    }
  }

  test("kappa is chance-corrected agreement in [-1, 1] with consistent cells") {
    rows("stat_cohens_kappa").foreach { r =>
      val cells = Seq("n11", "n10", "n01", "n00")
        .map(c => r.getLong(r.fieldIndex(c)))
      assert(cells.sum == r.getLong(r.fieldIndex("n")),
        s"${r.getString(0)}: cells don't partition n")
      if (!r.isNullAt(r.fieldIndex("kappa"))) {
        val k = r.getDouble(r.fieldIndex("kappa"))
        assert(k >= -1.0 - 1e-9 && k <= 1.0, s"${r.getString(0)}: kappa $k")
      }
    }
  }

  test("OLS R-squared lies in [0, 1] and betas are finite") {
    rows("stat_ols_multi").foreach { r =>
      val r2 = r.getDouble(r.fieldIndex("r2"))
      assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9, s"${r.getString(0)}: r2 $r2")
      Seq("beta0", "beta1", "beta2").foreach { b =>
        val v = r.getDouble(r.fieldIndex(b))
        assert(!v.isNaN && !v.isInfinite, s"${r.getString(0)} $b: $v")
      }
    }
  }

  test("ATR rows are nonnegative and start at bar 14 of the Holt day count") {
    val atr = rows("window_atr")
    atr.foreach { r =>
      assert(r.getDouble(r.fieldIndex("true_range")) >= 0.0)
      assert(r.getDouble(r.fieldIndex("atr_14")) >= 0.0)
    }
    // cross-query conservation: both queries bucket the same events by
    // day, so rows per type must be n_days - 13 (or absent if < 14)
    val holtDays = rows("time_holt_linear")
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("n_days"))).toMap
    val atrCounts = atr.groupBy(_.getString(0)).view.mapValues(_.length)
    holtDays.foreach { case (t, nd) =>
      val expected = math.max(0L, nd - 13)
      assert(atrCounts.getOrElse(t, 0) == expected,
        s"type $t: ${atrCounts.getOrElse(t, 0)} ATR rows, expected $expected")
    }
  }

  test("Holt forecast equals level plus trend") {
    rows("time_holt_linear").foreach { r =>
      val l = r.getDouble(r.fieldIndex("level"))
      val t = r.getDouble(r.fieldIndex("trend"))
      val f = r.getDouble(r.fieldIndex("forecast_1"))
      // all three are independently rounded to 9 dp
      assert(math.abs(f - (l + t)) < 2e-9, s"${r.getString(0)}: $f vs ${l + t}")
    }
  }

  test("importance sample keeps a subset with sane expectation accounting") {
    rows("sample_importance_weighted").foreach { r =>
      val n = r.getLong(r.fieldIndex("n_docs"))
      val kept = r.getLong(r.fieldIndex("n_kept"))
      val exp = r.getDouble(r.fieldIndex("expected_kept"))
      assert(kept >= 0 && kept <= n, s"${r.getString(0)}: $kept of $n")
      assert(exp > 0 && exp <= n.toDouble, s"${r.getString(0)}: expected $exp")
    }
  }

  test("Heaps exponent is a plausible vocabulary-growth rate") {
    rows("text_vocab_growth_heaps").foreach { r =>
      val b = r.getDouble(r.fieldIndex("heaps_beta"))
      // sublinear-or-linear growth; the 31-word synthetic vocabulary
      // saturates in the first decile at tiny SF, so beta = 0 is the
      // CORRECT readout there (total saturation), not a failure
      assert(b >= 0.0 && b <= 1.05, s"${r.getString(0)}: beta $b")
    }
  }

  test("Wilcoxon W2 stays inside the doubled rank-sum range") {
    rows("stat_wilcoxon_signed_rank").foreach { r =>
      val n = r.getLong(r.fieldIndex("n"))
      val w2 = r.getLong(r.fieldIndex("w2_plus"))
      // sum of doubled mid-ranks over ALL diffs is exactly n(n+1)
      assert(w2 >= 0 && w2 <= n * (n + 1), s"${r.getString(0)}: $w2 vs n=$n")
      val z = r.getDouble(r.fieldIndex("z"))
      assert(!z.isNaN && !z.isInfinite, s"${r.getString(0)}: z $z")
    }
  }

  test("Kendall tau-b is a valid rank correlation") {
    val r = rows("stat_kendall_tau_daily").head
    val (np, nc, nd) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nc + nd <= np, s"concordant $nc + discordant $nd > pairs $np")
    val tau = r.getDouble(r.fieldIndex("tau_b"))
    assert(tau >= -1.0 && tau <= 1.0, s"tau $tau")
  }

  test("rich-club membership and density behave monotonically in k") {
    val rs = rows("graph_rich_club").sortBy(_.getLong(0))
    assert(rs.length == 4)
    val ns = rs.map(_.getLong(rs.head.fieldIndex("n_nodes")))
    val es = rs.map(_.getLong(rs.head.fieldIndex("n_edges")))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"club sizes grow with k: ${ns.toSeq}")
    assert(es.zip(es.tail).forall { case (a, b) => a >= b },
      s"club edges grow with k: ${es.toSeq}")
    rs.filter(r => !r.isNullAt(r.fieldIndex("phi"))).foreach { r =>
      val phi = r.getDouble(r.fieldIndex("phi"))
      assert(phi >= 0.0 && phi <= 1.0, s"k=${r.getLong(0)}: phi $phi")
    }
  }

  test("Neyman allocation respects the budget and stratum sizes") {
    val rs = rows("sample_stratified_neyman")
    val totAlloc = rs.map(r => r.getLong(r.fieldIndex("allocated"))).sum
    assert(totAlloc <= 100, s"allocated $totAlloc over budget")
    val shares = rs.map(r => r.getDouble(r.fieldIndex("weight_share"))).sum
    assert(math.abs(shares - 1.0) < 1e-6, s"weight shares sum to $shares")
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_kept")) ==
        r.getLong(r.fieldIndex("allocated")),
        s"${r.getString(0)}: kept != allocated")
      assert(r.getLong(r.fieldIndex("allocated")) <=
        r.getLong(r.fieldIndex("n_docs")))
    }
  }

  test("ulcer index is bounded by the max drawdown depth") {
    rows("window_ulcer_index").foreach { r =>
      val mdd = r.getDouble(r.fieldIndex("max_drawdown"))
      val ui = r.getDouble(r.fieldIndex("ulcer_index"))
      assert(mdd <= 0.0, s"${r.getString(0)}: mdd $mdd positive")
      // sqrt(mean dd^2) <= max |dd|; both independently rounded to 9 dp
      assert(ui >= 0.0 && ui <= -mdd + 2e-9,
        s"${r.getString(0)}: ulcer $ui vs mdd $mdd")
    }
  }

  test("efficiency ratios are valid fractions of path length") {
    rows("window_kaufman_er").foreach { r =>
      if (!r.isNullAt(r.fieldIndex("efficiency_ratio"))) {
        val er = r.getDouble(r.fieldIndex("efficiency_ratio"))
        // |net| <= sum |steps| by triangle inequality
        assert(er >= 0.0 && er <= 1.0 + 1e-9,
          s"${r.getString(0)} ${r.getString(1)}: ER $er")
      }
    }
  }

  test("classical decomposition reconstructs the series and centers residuals") {
    val rs = rows("time_classical_decompose")
    rs.foreach { r =>
      val cnt = r.getLong(r.fieldIndex("cnt")).toDouble
      val sum = r.getDouble(r.fieldIndex("trend")) +
        r.getDouble(r.fieldIndex("seasonal")) +
        r.getDouble(r.fieldIndex("remainder"))
      assert(math.abs(sum - cnt) < 1e-6,
        s"${r.getString(0)} ${r.getString(1)}: $sum != $cnt")
    }
    // the seasonal means absorb the detrended series: per-type residual
    // totals vanish (each weekday cell sums to zero by construction)
    rs.groupBy(_.getString(0)).foreach { case (t, trs) =>
      val tot = trs.map(r => r.getDouble(r.fieldIndex("remainder"))).sum
      assert(math.abs(tot) < 1e-5, s"type $t: residual total $tot")
    }
  }

  test("chi-square divergences are nonnegative over the full pair grid") {
    val rs = rows("text_source_divergence_chi2")
    val nSources = (1 + math.sqrt(1 + 8.0 * rs.length)) / 2
    assert(nSources == nSources.floor, s"${rs.length} rows is not C(s,2)")
    // every pair profiles the SAME head vocabulary (<= 100: the tiny
    // synthetic corpus has only 31 types, so the cap may not bind)
    val nToks = rs.map(_.getLong(rs.head.fieldIndex("n_tokens"))).distinct
    assert(nToks.length == 1 && nToks.head >= 1 && nToks.head <= 100,
      s"vocab sizes $nToks")
    rs.foreach { r =>
      val d = r.getDouble(r.fieldIndex("chi2_divergence"))
      // chi-square distance is bounded by 2 for distributions
      assert(d >= 0.0 && d <= 2.0 + 1e-9,
        s"${r.getString(0)}/${r.getString(1)}: $d")
    }
  }

  test("k-center greedy selection distances shrink monotonically") {
    val rs = rows("sim_kcenter_greedy").sortBy(_.getLong(0))
    assert(rs.length == 5)
    val d2 = rs.map(r => r.getDouble(r.fieldIndex("sel_d2")))
    // seed row carries 0; from k=2 on the max-min distance is
    // nonincreasing, and the final coverage radius is below the last
    // selection distance
    assert(d2(1) >= d2(2) && d2(2) >= d2(3), s"selection distances grow: $d2")
    assert(d2(4) <= d2(3) + 1e-9, s"radius ${d2(4)} above last pick ${d2(3)}")
    assert(rs.map(_.getLong(1)).distinct.length == 5, "duplicate centers")
  }

  test("runs counts partition the direction sequence") {
    rows("stat_runs_test").foreach { r =>
      val n = r.getLong(r.fieldIndex("n"))
      assert(r.getLong(r.fieldIndex("n_up")) +
        r.getLong(r.fieldIndex("n_down")) == n)
      val runs = r.getLong(r.fieldIndex("runs"))
      assert(runs >= 1 && runs <= n, s"${r.getString(0)}: $runs runs of $n")
    }
  }

  test("modularity is a valid community-quality score") {
    val r = rows("graph_modularity").head
    val q = r.getDouble(r.fieldIndex("modularity"))
    // Newman Q is bounded by [-1/2, 1)
    assert(q >= -0.5 && q < 1.0, s"Q $q")
    assert(r.getLong(r.fieldIndex("intra_edges")) <=
      r.getLong(r.fieldIndex("n_edges")))
    assert(r.getLong(r.fieldIndex("n_communities")) >= 1)
  }

  test("readability aggregates keep at least one syllable per word") {
    rows("text_readability_fk").foreach { r =>
      val spw = r.getDouble(r.fieldIndex("syllables_per_word"))
      assert(spw >= 1.0, s"${r.getString(0)}: $spw syllables/word")
      val fk = r.getDouble(r.fieldIndex("fk_grade"))
      assert(!fk.isNaN && !fk.isInfinite)
    }
  }

  test("directional index components are consistent") {
    rows("window_adx_di").foreach { r =>
      val p = r.getDouble(r.fieldIndex("plus_di"))
      val m = r.getDouble(r.fieldIndex("minus_di"))
      val dx = r.getDouble(r.fieldIndex("dx"))
      assert(p >= 0 && m >= 0, s"${r.getString(0)}: DI $p/$m")
      assert(dx >= 0 && dx <= 100.0 + 1e-9, s"${r.getString(0)}: DX $dx")
      // DX is definitionally 100|+DI - -DI|/(+DI + -DI); all three are
      // independently rounded to 9 dp
      assert(math.abs(dx - 100.0 * math.abs(p - m) / (p + m)) < 1e-5,
        s"${r.getString(0)}: DX $dx vs DI $p/$m")
    }
  }

  test("pooled MATTR is a valid windowed type-token ratio") {
    rows("text_mattr").foreach { r =>
      val m = r.getDouble(r.fieldIndex("pooled_mattr"))
      // each 50-token window holds between 1 and 50 types; pooled is a
      // convex combination of per-window TTRs in (0, 1]
      assert(m > 0.0 && m <= 1.0, s"${r.getString(0)}: MATTR $m")
      assert(r.getLong(r.fieldIndex("n_windows")) > 0)
    }
  }

  test("PPS systematic sampling hits the target count within the edge slack") {
    rows("sample_pps_systematic").foreach { r =>
      val hits = r.getLong(r.fieldIndex("total_hits"))
      // the floor-division telescope over the full axis gives exactly
      // k grid points, plus/minus one at the boundary offsets
      assert(math.abs(hits - 20) <= 1, s"${r.getString(0)}: $hits hits")
      val sel = r.getLong(r.fieldIndex("n_selected"))
      assert(sel >= 1 && sel <= hits, s"${r.getString(0)}: $sel of $hits")
    }
  }

  test("MCC agrees with kappa's confusion cells and stays in [-1, 1]") {
    val kap = rows("stat_cohens_kappa")
      .map(r => r.getString(0) -> Seq("n11", "n10", "n01", "n00")
        .map(c => r.getLong(r.fieldIndex(c)))).toMap
    rows("stat_mcc_confusion").foreach { r =>
      val cells = Seq("n11", "n10", "n01", "n00")
        .map(c => r.getLong(r.fieldIndex(c)))
      // same raters, same corpus: the two evaluation queries must see
      // the IDENTICAL confusion matrix
      assert(kap(r.getString(0)) == cells,
        s"${r.getString(0)}: cells differ from kappa's")
      if (!r.isNullAt(r.fieldIndex("mcc"))) {
        val m = r.getDouble(r.fieldIndex("mcc"))
        assert(m >= -1.0 - 1e-9 && m <= 1.0 + 1e-9, s"mcc $m")
      }
    }
  }

  test("average neighbor degrees are at least 1 across the degree curve") {
    rows("graph_knn_degree_curve").foreach { r =>
      assert(r.getLong(r.fieldIndex("k")) >= 1)
      assert(r.getLong(r.fieldIndex("n_vertices")) >= 1)
      assert(r.getDouble(r.fieldIndex("knn_mean")) >= 1.0)
    }
  }

  test("RSI stays on the [0, 100] scale over full windows") {
    val rs = rows("window_rsi")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_bars")) >= 14)
      val v = r.getDouble(r.fieldIndex("rsi"))
      assert(v >= 0.0 && v <= 100.0, s"${r.getString(0)}: rsi $v")
    }
  }

  test("stochastic %K and %D stay on the [0, 100] scale") {
    val rs = rows("window_stochastic_osc")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      for (c <- Seq("pct_k", "pct_d") if !r.isNullAt(r.fieldIndex(c))) {
        val v = r.getDouble(r.fieldIndex(c))
        assert(v >= -1e-9 && v <= 100.0 + 1e-9, s"$c $v")
      }
    }
  }

  test("Cramér's V is the effect size of the chi-square grid") {
    val r = rows("stat_cramers_v").head
    val v = r.getDouble(r.fieldIndex("cramers_v"))
    assert(v >= 0.0 && v <= 1.0, s"V $v")
    // same densified contingency as the independence test: the chi2
    // statistics must agree to the output rounding
    val chi = rows("agg_chisq_independence").head
    assert(math.abs(r.getDouble(r.fieldIndex("chi2")) -
      chi.getDouble(chi.fieldIndex("chi2"))) < 1e-8,
      "chi2 differs from agg_chisq_independence")
  }

  test("the best Gini split never increases weighted impurity") {
    val rs = rows("stat_best_split_gini")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val gain = r.getDouble(r.fieldIndex("gain"))
      // Gini impurity is concave: a split cannot be worse than the parent
      assert(gain >= -1e-9, s"${r.getString(0)}: gain $gain")
      val nl = r.getLong(r.fieldIndex("n_left"))
      assert(nl >= 1 && nl < r.getLong(r.fieldIndex("n")))
    }
  }

  test("Markov transition rows are distributions per from-state") {
    val rs = rows("time_markov_transitions")
    assert(rs.nonEmpty && rs.size <= 25)
    rs.groupBy(_.getString(0)).foreach { case (from, g) =>
      val mass = g.map(r => r.getDouble(r.fieldIndex("prob"))).sum
      assert(math.abs(mass - 1.0) < 1e-6, s"$from: mass $mass")
    }
  }

  test("MMR picks are distinct non-probe vectors with decaying scores") {
    val rs = rows("sim_mmr_diversify").sortBy(_.getLong(0))
    assert(rs.size == 4)
    val ids = rs.map(r => r.getLong(r.fieldIndex("vec_id")))
    assert(ids.distinct.size == 4 && !ids.contains(1L))
    // msim is non-decreasing per candidate and the pool shrinks, so the
    // mixed scores (k >= 2) cannot increase stage over stage
    val mixed = rs.drop(1).map(r => r.getDouble(r.fieldIndex("score")))
    mixed.sliding(2).foreach { w =>
      assert(w(1) <= w(0) + 1e-9, s"MMR scores rose: ${w(0)} -> ${w(1)}")
    }
  }

  test("edit-distance verdicts cover exactly the verified near-dup pairs") {
    val lsh = rows("dedup_minhash_lsh")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ed = rows("dedup_editdist_verify")
    assert(ed.map(r => (r.getLong(0), r.getLong(1))).toSet == lsh)
    ed.foreach { r =>
      val d = r.getLong(r.fieldIndex("edit_distance"))
      val ml = r.getLong(r.fieldIndex("max_len"))
      assert(d >= 0 && d <= ml, s"d $d of $ml")
      val sim = r.getDouble(r.fieldIndex("edit_similarity"))
      assert(sim >= 0.0 && sim <= 1.0, s"sim $sim")
    }
  }

  test("Croston smoothing stays on the demand scale") {
    val rs = rows("time_croston_forecast")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_demand_days")) >= 6)
      val z = r.getDouble(r.fieldIndex("smoothed_size"))
      val p = r.getDouble(r.fieldIndex("smoothed_interval"))
      assert(z > 0.0, s"size $z")
      // intervals are day gaps >= 1, so their smoothing stays >= 1
      assert(p >= 1.0, s"interval $p")
      assert(r.getDouble(r.fieldIndex("demand_rate")) <= z + 1e-9)
    }
  }

  test("Friedman statistic is a nonnegative chi-square value") {
    val r = rows("stat_friedman_test").head
    assert(r.getLong(r.fieldIndex("dof")) ==
      r.getLong(r.fieldIndex("k")) - 1)
    assert(r.getDouble(r.fieldIndex("q")) >= 0.0)
  }

  test("nearest-centroid covers every odd vector with sane accuracies") {
    val rs = rows("sim_nearest_centroid")
    assert(rs.nonEmpty)
    val total = rs.map(r => r.getLong(r.fieldIndex("n_test"))).sum
    val odd = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter("vec_id % 2 = 1").count()
    assert(total == odd, s"covered $total of $odd test vectors")
    rs.foreach { r =>
      val a = r.getDouble(r.fieldIndex("accuracy"))
      assert(a >= 0.0 && a <= 1.0, s"accuracy $a")
      assert(r.getLong(r.fieldIndex("n_correct")) <=
        r.getLong(r.fieldIndex("n_test")))
    }
  }

  test("Burrows' Delta is a nonnegative pairwise distance over the head") {
    val rs = rows("text_burrows_delta")
    assert(rs.nonEmpty)
    val n = rs.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.size
    assert(rs.size == n * (n - 1) / 2, s"${rs.size} pairs for $n sources")
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_words")) == 30L)
      assert(r.getDouble(r.fieldIndex("delta")) >= 0.0)
    }
  }

  test("Donchian channels are ordered and breakouts are one-sided") {
    rows("window_donchian_channel").foreach { r =>
      assert(r.getDouble(r.fieldIndex("channel_high")) >=
        r.getDouble(r.fieldIndex("channel_low")))
      assert(!(r.getBoolean(r.fieldIndex("breakout_up")) &&
        r.getBoolean(r.fieldIndex("breakout_down"))))
    }
  }

  test("local clustering coefficients are a sorted [0, 1] head") {
    val rs = rows("graph_local_clustering_topk")
    assert(rs.nonEmpty && rs.size <= 20)
    val ccs = rs.map(r => r.getDouble(r.fieldIndex("local_cc")))
    assert(ccs.forall(c => c >= 0.0 && c <= 1.0))
    ccs.sliding(2).foreach { w =>
      if (w.size == 2) assert(w(1) <= w(0) + 1e-12, "head not sorted")
    }
  }

  test("Kruskal-Wallis H and ANOVA F are nonnegative with k-1 dof") {
    val kw = rows("stat_kruskal_wallis").head
    assert(kw.getLong(kw.fieldIndex("dof")) ==
      kw.getLong(kw.fieldIndex("k")) - 1)
    assert(kw.getDouble(kw.fieldIndex("h")) >= 0.0)
    val f = rows("stat_anova_f").head
    assert(f.getDouble(f.fieldIndex("f")) >= 0.0)
    assert(f.getLong(f.fieldIndex("dof_within")) ==
      f.getLong(f.fieldIndex("n")) - f.getLong(f.fieldIndex("k")))
  }

  test("permutation p-value includes the observed split and is proper") {
    val r = rows("stat_permutation_test").head
    val ne = r.getLong(r.fieldIndex("n_extreme"))
    val np = r.getLong(r.fieldIndex("n_perms"))
    assert(np == 32L)
    // the observed assignment is permutation 0, so it always counts
    assert(ne >= 1L && ne <= np)
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p >= 1.0 / 32.0 - 1e-12 && p <= 1.0)
  }

  test("Cochran-Armitage counts are consistent marginals") {
    val r = rows("stat_cochran_armitage").head
    assert(r.getLong(r.fieldIndex("r")) <= r.getLong(r.fieldIndex("n")))
    assert(r.getLong(r.fieldIndex("k")) <= 4L)
  }

  test("two-stage cluster sample keeps about one third of picked-user events") {
    val rs = rows("sample_two_stage_cluster")
    assert(rs.nonEmpty)
    val sampled = rs.map(r => r.getLong(r.fieldIndex("n_events"))).sum
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    // 1-in-5 users x 1-in-3 events ~ 1/15 of all events, loose band
    assert(sampled > total / 60 && sampled < total / 4,
      s"$sampled of $total events sampled")
  }

  test("Brown-Forsythe W is a nonnegative F with consistent dofs") {
    val r = rows("stat_levene_bf").head
    assert(r.getDouble(r.fieldIndex("w_stat")) >= 0.0)
    assert(r.getLong(r.fieldIndex("dof_between")) ==
      r.getLong(r.fieldIndex("k")) - 1)
    assert(r.getLong(r.fieldIndex("dof_within")) ==
      r.getLong(r.fieldIndex("n")) - r.getLong(r.fieldIndex("k")))
  }

  test("MACD histogram is the macd-signal residual per type") {
    val rs = rows("window_macd")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val macd = r.getDouble(r.fieldIndex("macd"))
      val sig = r.getDouble(r.fieldIndex("signal"))
      val hist = r.getDouble(r.fieldIndex("histogram"))
      // all three are independently rounded to 9 decimals
      assert(math.abs(hist - (macd - sig)) < 2e-9, s"$hist vs ${macd - sig}")
      assert(r.getLong(r.fieldIndex("n_days")) >= 1L)
    }
  }

  test("SRM chi-square is nonnegative over exactly 4 hash variants") {
    val r = rows("stat_srm_check").head
    assert(r.getLong(r.fieldIndex("k")) == 4L)
    assert(r.getLong(r.fieldIndex("dof")) == 3L)
    assert(r.getDouble(r.fieldIndex("chi2")) >= 0.0)
    assert(r.getLong(r.fieldIndex("min_units")) <=
      r.getLong(r.fieldIndex("max_units")))
  }

  test("capture-recapture overlap and Chapman estimate are consistent") {
    val r = rows("stat_capture_recapture").head
    val (n1, n2, m) = (r.getLong(r.fieldIndex("n1")),
      r.getLong(r.fieldIndex("n2")), r.getLong(r.fieldIndex("m")))
    assert(m <= math.min(n1, n2))
    val nHat = r.getDouble(r.fieldIndex("n_hat"))
    assert(nHat > 0.0)
    val nTrue = r.getLong(r.fieldIndex("n_true"))
    assert(math.abs(r.getDouble(r.fieldIndex("rel_error")) -
      (nHat / nTrue - 1.0)) < 2e-9)
  }

  test("JS divergence is bounded by ln 2 over the same grid as chi2") {
    val rs = rows("text_js_divergence")
    val chi2 = rows("text_source_divergence_chi2")
    assert(rs.length == chi2.length)
    // the grid is the shared head vocabulary (<= 100 at tiny SFs) —
    // both screens must see exactly the same token count per pair
    val gridSize = chi2.head.getLong(chi2.head.fieldIndex("n_tokens"))
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_tokens")) == gridSize)
      val v = r.getDouble(r.fieldIndex("jsd_nats"))
      assert(v >= 0.0 && v <= math.log(2.0) + 1e-9,
        s"${r.getString(0)}/${r.getString(1)}: $v outside [0, ln 2]")
    }
  }

  test("RA link-prediction pairs are canonical with positive scores") {
    val rs = rows("graph_link_prediction_ra")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("u")) < r.getLong(r.fieldIndex("v")))
      assert(r.getLong(r.fieldIndex("common")) >= 1)
      assert(r.getDouble(r.fieldIndex("ra_score")) > 0.0)
    }
    val scores = rs.map(_.getDouble(rs.head.fieldIndex("ra_score")))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not descending")
  }

  test("KS statistic is a [0,1] sup and lambda is its sqrt-scaled form") {
    val r = rows("stat_ks_two_sample").head
    val (na, nb) = (r.getLong(r.fieldIndex("n_a")), r.getLong(r.fieldIndex("n_b")))
    assert(na > 0 && nb > 0)
    val d = r.getDouble(r.fieldIndex("d_stat"))
    assert(d >= 0.0 && d <= 1.0)
    val lam = r.getDouble(r.fieldIndex("ks_lambda"))
    // d and lambda are rounded to 9 decimals independently
    assert(math.abs(lam - d * math.sqrt(na.toDouble * nb / (na + nb))) < 1e-8)
  }

  test("chi2 keywords rank 1..3 per source with nonnegative scores") {
    val rs = rows("text_keyword_chi2")
    assert(rs.nonEmpty)
    rs.groupBy(_.getString(0)).foreach { case (src, g) =>
      val ranks = g.map(_.getLong(g.head.fieldIndex("rk"))).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"$src ranks $ranks")
      val cs = g.sortBy(_.getLong(g.head.fieldIndex("rk")))
        .map(_.getDouble(g.head.fieldIndex("chi2")))
      assert(cs.forall(_ >= 0.0))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"$src chi2 not descending: $cs")
    }
  }

  test("Chao1 never estimates below the observed bigram vocabulary") {
    val r = rows("stat_chao1_unseen").head
    val sObs = r.getLong(r.fieldIndex("s_obs"))
    assert(r.getLong(r.fieldIndex("f1")) + r.getLong(r.fieldIndex("f2")) <= sObs)
    assert(r.getDouble(r.fieldIndex("chao1")) >= sObs.toDouble)
    val mm = r.getDouble(r.fieldIndex("gt_missing_mass"))
    assert(mm >= 0.0 && mm < 1.0)
  }

  test("ACF is bounded by 1 with term counts shrinking as the lag grows") {
    val rs = rows("time_acf").sortBy(_.getLong(0))
    assert(rs.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 7L, 14L))
    rs.foreach { r =>
      assert(math.abs(r.getDouble(r.fieldIndex("acf"))) <= 1.0 + 1e-9)
    }
    val ns = rs.map(_.getLong(rs.head.fieldIndex("n_terms")))
    assert(ns.zip(ns.tail).forall { case (a, b) => a > b },
      s"n_terms not strictly shrinking: $ns")
  }

  test("retention cohorts lead with their full size at offset zero") {
    val rs = rows("agg_retention_cohorts")
    assert(rs.nonEmpty)
    assert(rs.forall(_.getLong(rs.head.fieldIndex("week_offset")) >= 0L))
    rs.groupBy(_.getString(0)).foreach { case (cw, g) =>
      val byOff = g.map(r => r.getLong(g.head.fieldIndex("week_offset")) ->
        r.getLong(g.head.fieldIndex("n_users"))).toMap
      assert(byOff.contains(0L), s"$cw missing offset 0")
      assert(byOff.values.forall(_ <= byOff(0L)),
        s"$cw retention exceeds cohort size: $byOff")
    }
  }

  test("KM survival is a non-increasing curve with honest risk sets") {
    val rs = rows("stat_kaplan_meier").sortBy(_.getLong(0))
    assert(rs.map(_.getLong(0)).toSeq == Seq(30L, 90L, 180L, 365L, 730L))
    val surv = rs.map(_.getDouble(rs.head.fieldIndex("survival")))
    assert(surv.forall(v => v > 0.0 && v <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b },
      s"survival not non-increasing: ${surv.toSeq}")
    val risk = rs.map(_.getLong(rs.head.fieldIndex("n_risk")))
    assert(risk.zip(risk.tail).forall { case (a, b) => a >= b })
    val ev = rs.map(_.getLong(rs.head.fieldIndex("n_events")))
    assert(ev.zip(ev.tail).forall { case (a, b) => a <= b })
  }

  test("CUSUM peak is a nonnegative excursion on a real day") {
    val r = rows("stat_cusum_peak").head
    assert(r.getDouble(r.fieldIndex("peak_excess_dollars")) >= 0.0)
    assert(r.getString(r.fieldIndex("peak_day")).matches("\\d{4}-\\d{2}-\\d{2}"))
    assert(r.getLong(r.fieldIndex("n_days")) >= 1L)
  }

  test("McNemar cells partition the corpus and cross-pin Cochran totals") {
    val m = rows("stat_mcnemar").head
    val q = rows("stat_cochran_q").head
    val cells = Seq("both_pass", "b", "c", "both_fail")
      .map(f => m.getLong(m.fieldIndex(f)))
    assert(cells.sum == q.getLong(q.fieldIndex("n_docs")))
    // gate A/B marginals must agree between the two tests
    assert(cells(0) + cells(1) == q.getLong(q.fieldIndex("c1")))
    assert(cells(0) + cells(2) == q.getLong(q.fieldIndex("c2")))
    assert(m.getDouble(m.fieldIndex("chi2")) >= 0.0)
    assert(q.getDouble(q.fieldIndex("q_stat")) >= 0.0)
  }

  test("Ljung-Box is a nonnegative 10-lag portmanteau") {
    val r = rows("stat_ljung_box").head
    assert(r.getLong(r.fieldIndex("n_lags")) == 10L)
    assert(r.getLong(r.fieldIndex("dof")) == 10L)
    assert(r.getLong(r.fieldIndex("m")) > 14L)
    assert(r.getDouble(r.fieldIndex("q_stat")) >= 0.0)
  }

  test("Dickey-Fuller finds mean reversion in daily revenue") {
    val r = rows("stat_dickey_fuller").head
    // white-noise-ish daily revenue: beta near -1, DF deeply negative
    assert(r.getDouble(r.fieldIndex("beta_hat")) < 0.0)
    assert(r.getDouble(r.fieldIndex("df_stat")) < 0.0)
    assert(r.getLong(r.fieldIndex("m")) > 14L)
  }

  test("Holt-Winters folds all five series past the seed week") {
    val rs = rows("time_holt_winters")
    assert(rs.length == 5)
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_days")) >= 8L)
      assert(r.getDouble(r.fieldIndex("level")) > 0.0)
    }
  }

  test("Grubbs statistic is positive and bounded by its algebraic max") {
    val rs = rows("stat_grubbs_outlier")
    assert(rs.length == 5)
    rs.foreach { r =>
      val g = r.getDouble(r.fieldIndex("g_stat"))
      val n = r.getLong(r.fieldIndex("n"))
      // G <= (n-1)/sqrt(n) is the algebraic maximum of the statistic
      assert(g > 0.0 && g <= (n - 1).toDouble / math.sqrt(n.toDouble))
      assert(r.getDouble(r.fieldIndex("suspect_value")) >= 0.0)
    }
  }

  test("Jarque-Bera reproduces from its own skew and kurtosis columns") {
    val rs = rows("stat_jarque_bera")
    assert(rs.length == 5)
    rs.foreach { r =>
      val (s, k) = (r.getDouble(r.fieldIndex("skewness")),
        r.getDouble(r.fieldIndex("ex_kurtosis")))
      val jb = r.getDouble(r.fieldIndex("jb_stat"))
      val n = r.getLong(r.fieldIndex("n"))
      assert(jb >= 0.0)
      assert(math.abs(jb - n / 6.0 * (s * s + k * k / 4.0)) < 1e-4,
        s"${r.getString(0)}: $jb vs recomputed")
    }
  }

  test("RFM segments carry valid 1..5 digit scores and positive spend") {
    val rs = rows("agg_rfm_segments")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val seg = r.getLong(r.fieldIndex("segment"))
      val (d1, d2, d3) = (seg / 100, seg / 10 % 10, seg % 10)
      assert(Seq(d1, d2, d3).forall(d => d >= 1 && d <= 5), s"segment $seg")
      assert(r.getLong(r.fieldIndex("n_customers")) >= 1L)
      assert(r.getLong(r.fieldIndex("avg_spend_cents")) > 0L)
    }
  }

  test("dispersion index is positive and its z recomputes") {
    val r = rows("stat_poisson_dispersion").head
    val d = r.getDouble(r.fieldIndex("dispersion"))
    val n = r.getLong(r.fieldIndex("n"))
    assert(d > 0.0)
    assert(math.abs(r.getDouble(r.fieldIndex("z")) -
      (d - 1.0) * math.sqrt((n - 1).toDouble / 2.0)) < 1e-6)
  }

  test("Hurst R/S is positive with one shared exponent across block sizes") {
    val rs = rows("stat_hurst_rs").sortBy(_.getLong(0))
    assert(rs.map(_.getLong(0)).toSeq == Seq(7L, 14L, 28L))
    assert(rs.forall(_.getDouble(rs.head.fieldIndex("mean_rs")) > 0.0))
    val hs = rs.map(_.getDouble(rs.head.fieldIndex("hurst"))).distinct
    assert(hs.length == 1, s"hurst not shared: $hs")
    assert(hs.head > -0.5 && hs.head < 1.5, s"hurst ${hs.head} implausible")
    val bs = rs.map(_.getLong(rs.head.fieldIndex("n_blocks")))
    assert(bs.zip(bs.tail).forall { case (a, b) => a >= b })
  }

  test("entropy rate sits inside [0, uniform ceiling]") {
    val r = rows("stat_markov_entropy").head
    val h = r.getDouble(r.fieldIndex("entropy_rate_nats"))
    val ceil = r.getDouble(r.fieldIndex("uniform_ceiling"))
    assert(h >= 0.0 && h <= ceil + 1e-9, s"$h outside [0, $ceil]")
    assert(r.getLong(r.fieldIndex("n_states")) == 5L)
  }

  test("PSI is nonnegative over the full densified bucket grid") {
    val rs = rows("curation_psi_drift")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_buckets")) == 11L)
      // each (p-q)·ln(p/q) term is nonnegative, so PSI must be
      assert(r.getDouble(r.fieldIndex("psi")) >= 0.0,
        s"${r.getString(0)}: negative PSI")
    }
  }

  test("ABC classes partition revenue with a dominant A share") {
    val rs = rows("agg_abc_analysis")
    assert(rs.map(_.getString(0)).sorted.toSeq == Seq("A", "B", "C"))
    val shares = rs.map(r => r.getString(0) ->
      r.getDouble(r.fieldIndex("revenue_share"))).toMap
    assert(math.abs(shares.values.sum - 1.0) < 1e-8)
    assert(shares("A") > shares("C"))
    rs.foreach(r => assert(r.getLong(r.fieldIndex("n_parts")) >= 1L))
  }

  test("odds ratio sits inside its own Woolf interval over full cells") {
    val r = rows("stat_odds_ratio").head
    val or = r.getDouble(r.fieldIndex("odds_ratio"))
    val (lo, hi) = (r.getDouble(r.fieldIndex("ci_low")),
      r.getDouble(r.fieldIndex("ci_high")))
    assert(lo > 0.0 && lo <= or && or <= hi, s"$lo / $or / $hi")
    assert(r.getDouble(r.fieldIndex("relative_risk")) > 0.0)
    val q = rows("stat_cochran_q").head
    val cells = Seq("a", "b", "c", "d").map(f => r.getLong(r.fieldIndex(f)))
    assert(cells.sum == q.getLong(q.fieldIndex("n_docs")))
  }

  test("revenue bridge effects reconstruct the relative delta per brand") {
    val rs = rows("agg_revenue_bridge")
    assert(rs.length == 25)
    rs.foreach { r =>
      val (r1, r2) = (r.getLong(r.fieldIndex("r1_cents")),
        r.getLong(r.fieldIndex("r2_cents")))
      assert(r.getLong(r.fieldIndex("delta_cents")) == r2 - r1)
      val recon = r.getDouble(r.fieldIndex("price_effect_ratio")) +
        r.getDouble(r.fieldIndex("volume_effect_ratio"))
      assert(math.abs(recon - (r2 - r1).toDouble / r1) < 1e-8,
        s"${r.getString(0)}: $recon vs ${(r2 - r1).toDouble / r1}")
    }
  }

  test("Durbin-Watson stays inside its algebraic [0, 4] range") {
    val r = rows("stat_durbin_watson").head
    val dw = r.getDouble(r.fieldIndex("dw"))
    assert(dw >= 0.0 && dw <= 4.0, s"dw $dw")
  }

  test("cohort LTV accumulates and cross-pins retention cohort sizes") {
    val ltv = rows("agg_cohort_ltv")
    assert(ltv.nonEmpty)
    ltv.groupBy(_.getString(0)).foreach { case (cw, g) =>
      val sorted = g.sortBy(_.getLong(g.head.fieldIndex("week_offset")))
      val cums = sorted.map(_.getLong(g.head.fieldIndex("cum_cents")))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, s"$cw")
      sorted.foreach { r =>
        assert(r.getLong(r.fieldIndex("ltv_cents")) ==
          r.getLong(r.fieldIndex("cum_cents")) /
            r.getLong(r.fieldIndex("n_users")))
      }
    }
    // cohort sizes must agree with the retention matrix's offset-0 cells
    val ret = rows("agg_retention_cohorts")
      .filter(_.getLong(1) == 0L).map(r => r.getString(0) -> r.getLong(2))
      .toMap
    ltv.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_users")) == ret(r.getString(0)),
        s"${r.getString(0)} cohort size mismatch vs retention")
    }
  }

  test("TOST declares hash halves equivalent with a symmetric margin") {
    val rs = rows("stat_tost_equivalence")
    assert(rs.length == 5)
    rs.foreach { r =>
      // at the tiny spec SF the halves can be underpowered for the
      // ±5% margin, so pin the MACHINERY: verdict recomputes from the
      // two one-sided statistics, which must straddle the margin
      val (tl, tu) = (r.getDouble(r.fieldIndex("t_lower")),
        r.getDouble(r.fieldIndex("t_upper")))
      assert(tl > tu)
      assert(r.getDouble(r.fieldIndex("margin")) > 0.0)
      assert(r.getBoolean(r.fieldIndex("equivalent")) ==
        (tl >= 1.645 && tu <= -1.645), s"${r.getString(0)} verdict")
    }
  }

  test("power sizing is self-consistent") {
    val r = rows("stat_power_mde").head
    val p = r.getDouble(r.fieldIndex("conv_rate"))
    assert(p > 0.0 && p <= 1.0)
    val (abs0, rel) = (r.getDouble(r.fieldIndex("mde_abs")),
      r.getDouble(r.fieldIndex("mde_rel")))
    assert(math.abs(rel - abs0 / p) < 1e-6)
    // p = 1 at the tiny spec SF (everyone purchases): variance and
    // required n are legitimately 0 there, positive otherwise
    if (p < 1.0) assert(r.getLong(r.fieldIndex("n_per_arm_for_10pct")) > 0L)
    else assert(r.getLong(r.fieldIndex("n_per_arm_for_10pct")) == 0L)
  }

  test("seasonal and trend strengths stay inside [0, 1]") {
    val rs = rows("time_seasonal_strength")
    assert(rs.length == 5)
    rs.foreach { r =>
      for (f <- Seq("seasonal_strength", "trend_strength")) {
        val v = r.getDouble(r.fieldIndex(f))
        assert(v >= 0.0 && v <= 1.0, s"${r.getString(0)} $f=$v")
      }
    }
  }

  test("Cpk never exceeds Cp and sigma is positive") {
    val rs = rows("stat_cpk_capability")
    assert(rs.length == 5)
    rs.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sigma_dollars")) > 0.0)
      assert(r.getDouble(r.fieldIndex("cpk")) <=
        r.getDouble(r.fieldIndex("cp")) + 1e-9,
        s"${r.getString(0)}: cpk above cp")
    }
  }

  test("Yule's K is nonnegative with vocab bounded by token mass") {
    val r = rows("text_yules_k").head
    assert(r.getDouble(r.fieldIndex("yules_k")) >= 0.0)
    assert(r.getLong(r.fieldIndex("vocab")) <=
      r.getLong(r.fieldIndex("n_tokens")))
  }

  test("Fleiss kappa is bounded and cross-pins the Cochran gate totals") {
    val r = rows("stat_fleiss_kappa").head
    val k = r.getDouble(r.fieldIndex("kappa"))
    assert(k >= -1.0 && k <= 1.0)
    // with 3 binary raters the worst per-doc agreement is 1/3
    assert(r.getDouble(r.fieldIndex("p_bar")) >= 1.0 / 3.0 - 1e-9)
    val q = rows("stat_cochran_q").head
    val sx = Seq("c1", "c2", "c3").map(f => q.getLong(q.fieldIndex(f))).sum
    assert(math.abs(r.getDouble(r.fieldIndex("p_pass")) -
      sx.toDouble / (3.0 * q.getLong(q.fieldIndex("n_docs")))) < 1e-9)
  }

  test("log-rank accepts on hash halves with a positive expectation") {
    val r = rows("stat_logrank_test").head
    assert(r.getLong(r.fieldIndex("n1_total")) > 0L)
    assert(r.getLong(r.fieldIndex("n2_total")) > 0L)
    assert(r.getDouble(r.fieldIndex("e1")) > 0.0)
    // hash halves of one population: the test must not scream
    assert(math.abs(r.getDouble(r.fieldIndex("z"))) < 6.0,
      s"z=${r.getDouble(r.fieldIndex("z"))} on a null split")
  }

  test("quantized retrieval eval stays in range over the 10-probe panel") {
    val r = rows("sim_ndcg_quantized").head
    assert(r.getLong(r.fieldIndex("n_probes")) == 10L)
    val ndcg = r.getDouble(r.fieldIndex("mean_ndcg_at10"))
    assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-9, s"ndcg $ndcg")
    val mrr = r.getDouble(r.fieldIndex("mrr"))
    assert(mrr >= 0.0 && mrr <= 1.0)
    val ov = r.getLong(r.fieldIndex("total_overlap"))
    assert(ov >= 0L && ov <= 100L)
    // int8 at 64 dims should be a nearly faithful ranker
    assert(ndcg > 0.8, s"quantized index collapsed: ndcg $ndcg")
  }

  test("ESD round 1 is exactly Grubbs and later rounds stay positive") {
    val esd = rows("stat_esd_outliers")
    assert(esd.length == 15)
    val grubbs = rows("stat_grubbs_outlier")
      .map(r => r.getString(0) -> (r.getDouble(r.fieldIndex("suspect_value")),
        r.getDouble(r.fieldIndex("g_stat")))).toMap
    esd.groupBy(_.getString(0)).foreach { case (tpe, g) =>
      val byRound = g.map(r => r.getLong(r.fieldIndex("esd_round")) ->
        (r.getDouble(r.fieldIndex("suspect_value")),
          r.getDouble(r.fieldIndex("g_stat")))).toMap
      assert(byRound.keySet == Set(1L, 2L, 3L), s"$tpe rounds")
      assert(byRound(1L) == grubbs(tpe), s"$tpe round 1 != Grubbs")
      byRound.values.foreach { case (sv, gs) =>
        assert(sv >= 0.0 && gs > 0.0)
      }
    }
  }

  test("CDC chunking accounts every chunk with a bounded dup rate") {
    val r = rows("dedup_cdc_chunks").head
    val (nc, nd) = (r.getLong(r.fieldIndex("n_chunks")),
      r.getLong(r.fieldIndex("n_distinct_chunks")))
    assert(nc >= nd && nd >= 1L)
    val rate = r.getDouble(r.fieldIndex("dup_chunk_rate"))
    assert(rate >= 0.0 && rate < 1.0)
    assert(math.abs(rate -
      r.getLong(r.fieldIndex("n_dup_instances")).toDouble / nc) < 1e-9)
    val avg = r.getLong(r.fieldIndex("avg_chunk_chars"))
    assert(avg >= 1L && avg <= 1000L, s"avg chunk $avg")
  }

  test("Parkinson volatility is positive across all five types") {
    val rs = rows("stat_parkinson_vol")
    assert(rs.length == 5)
    rs.foreach { r =>
      assert(r.getDouble(r.fieldIndex("parkinson_sigma")) > 0.0)
      assert(r.getLong(r.fieldIndex("n_days")) >= 1L)
    }
  }

  test("funnel steps are monotone and the rates reproduce the counts") {
    val r = rows("agg_funnel_conversion").head
    val (v, c, p) = (r.getLong(r.fieldIndex("n_view")),
      r.getLong(r.fieldIndex("n_click")), r.getLong(r.fieldIndex("n_purchase")))
    assert(v >= c && c >= p, s"funnel not monotone: $v $c $p")
    assert(v > c, "time budget did not bite - funnel is degenerate")
    assert(math.abs(r.getDouble(r.fieldIndex("view_to_click")) -
      c.toDouble / v) < 2e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("click_to_purchase")) -
      p.toDouble / c) < 2e-9)
  }
}
