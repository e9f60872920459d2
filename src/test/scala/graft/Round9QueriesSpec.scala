package graft

import graft.ops.PipelineCache

/** Mathematical invariants + independent scala replays of the round-9
  * wave-21 operators (Mantel–Haenszel, Theil decomposition, BH-FDR) —
  * the [[Round8QueriesSpec]] pattern: the oracle gate proves both
  * engines compute the same number; these pin that the number satisfies
  * its definition, via a THIRD construction (driver-side scala over
  * collected raw aggregates) where the formula is cheap to restate.
  */
class Round9QueriesSpec extends SparkTestBase {

  private def rows(q: String) = {
    val out = SparkEntry.queries(q)(spark, sfDir).collect()
    PipelineCache.releaseAll()
    out
  }

  test("Mantel-Haenszel OR equals a scala replay over the per-nation tables") {
    val r = rows("stat_mantel_haenszel").head
    val orMh = r.getDouble(r.fieldIndex("or_mh"))
    val orCrude = r.getDouble(r.fieldIndex("or_crude"))
    assert(orMh > 0 && orCrude > 0)
    // replay: rebuild the 2x2 cells from the raw tables in scala
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val cells = ops.Tables.orders(spark, sfDir)
      .join(ops.Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) > 150000.0).as("e"),
        (col("o_orderstatus") === "F").as("y"))
      .collect()
      .groupBy(_.getAs[Number](0).longValue) // c_nationkey is int32
      .toSeq.sortBy(_._1)
    var num = 0.0; var den = 0.0
    var sa = 0L; var sb = 0L; var sc = 0L; var sd = 0L
    cells.foreach { case (_, rs) =>
      val a = rs.count(r => r.getBoolean(1) && r.getBoolean(2)).toLong
      val b = rs.count(r => r.getBoolean(1) && !r.getBoolean(2)).toLong
      val c = rs.count(r => !r.getBoolean(1) && r.getBoolean(2)).toLong
      val d = rs.count(r => !r.getBoolean(1) && !r.getBoolean(2)).toLong
      val n = (a + b + c + d).toDouble
      num += a.toDouble * d.toDouble / n
      den += b.toDouble * c.toDouble / n
      sa += a; sb += b; sc += c; sd += d
    }
    assert(math.abs(orMh - num / den) <= 1e-9, s"$orMh vs ${num / den}")
    assert(math.abs(orCrude -
      sa.toDouble * sd.toDouble / (sb.toDouble * sc.toDouble)) <= 1e-9)
    assert(r.getLong(r.fieldIndex("n_strata")) == cells.size.toLong)
  }

  test("Theil decomposition: T_total = T_between + sum of share-weighted withins") {
    val out = rows("agg_theil_decomp")
    val byKey = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(r.fieldIndex("revenue_share")),
        r.getDouble(r.fieldIndex("theil")))).toMap
    val tTotal = byKey(-2L)._3
    val tBetween = byKey(-1L)._3
    val withins = byKey.filter(_._1 >= 0).values
    // every Theil component is non-negative (T is an entropy-family
    // index; within terms can only dip below 0 by fp noise)
    assert(tTotal >= 0 && tBetween >= -1e-12)
    withins.foreach { case (_, s, t) =>
      assert(s > 0 && s <= 1); assert(t >= -1e-9)
    }
    val shares = withins.map(_._2).sum
    assert(math.abs(shares - 1.0) <= 1e-6, s"shares sum $shares")
    val recomposed = tBetween + withins.map { case (_, s, t) => s * t }.sum
    // round-9 outputs: identity holds to the rounding granularity x 27
    assert(math.abs(tTotal - recomposed) <= 1e-6,
      s"decomposition broken: total $tTotal vs between+within $recomposed")
  }

  test("BH-FDR discovery set equals the step-up procedure replayed in scala") {
    val out = rows("stat_bh_fdr")
    assert(out.length == 25)
    val m = out.length
    val alpha = 0.05
    val ps = out.map(r => (r.getDouble(r.fieldIndex("p_value")),
      r.getAs[Number](0).longValue, r.getBoolean(r.fieldIndex("discovered")),
      r.getDouble(r.fieldIndex("p_adj"))))
    ps.foreach { case (p, k, _, padj) =>
      assert(p >= 0 && p <= 1, s"nation $k p=$p")
      assert(padj >= p - 1e-9 && padj <= 1.0, s"nation $k p_adj=$padj < p=$p")
    }
    // replay the step-up: rank ascending, k* = max{i: p_i <= i*alpha/m}
    val ranked = ps.sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case (t, i) => (t, i + 1) }
    val kstar = ranked.filter { case ((p, _, _, _), i) => p <= i * alpha / m }
      .map(_._2).reduceOption(_ max _).getOrElse(0)
    ranked.foreach { case ((p, key, disc, _), i) =>
      assert(disc == (i <= kstar),
        s"nation $key rank $i p=$p: discovered=$disc but kstar=$kstar")
    }
    // adjusted p must be the suffix-min of m*p/rank, capped at 1
    val mp = ranked.map { case ((p, _, _, _), i) => m.toDouble * p / i }
    val sufMin = mp.scanRight(Double.MaxValue)(math.min).init.map(math.min(_, 1.0))
    ranked.zip(sufMin).foreach { case (((_, key, _, padj), _), want) =>
      assert(math.abs(padj - want) <= 1e-8, s"nation $key p_adj $padj != $want")
    }
  }

  test("normal-CDF polynomial agrees with textbook values to its 7.5e-8 bound") {
    // the A&S 7.1.26 tree both engines spell out, restated in scala and
    // checked against published two-sided p reference values
    val known = Seq(
      0.0 -> 1.0, 1.0 -> 0.3173105078629141, 1.959963985 -> 0.05,
      2.5758293035 -> 0.01, 3.0 -> 0.002699796063)
    known.foreach { case (z, want) =>
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
      val p = 2.0 * (0.3989422804014327 * math.exp(-0.5 * az * az)) * poly
      assert(math.abs(p - want) <= 1.5e-7, s"z=$z: $p vs $want")
    }
  }
  test("isotonic calibration equals a scala pool-adjacent-violators replay") {
    val out = rows("stat_isotonic_calibration")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    // monotone nondecreasing by construction
    out.sliding(2).foreach { case Array((b1, _, _, f1), (b2, _, _, f2)) =>
      assert(f2 >= f1 - 1e-9, s"iso fit not monotone at $b1 -> $b2: $f1 > $f2")
    case _ => }
    // PAV stack replay over the same (n, raw-rate) bins
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val bins = ops.Tables.orders(spark, sfDir)
      .select(floor(col("o_totalprice") / 12000.0).cast(LongType).as("bucket"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum("y").as("ys"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    case class Block(var n: Long, var ys: Long) { def rate = ys.toDouble / n }
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Block, Int)]
    bins.zipWithIndex.foreach { case ((_, n, ys), i) =>
      stack += ((Block(n, ys), 1))
      while (stack.size >= 2 &&
        stack(stack.size - 2)._1.rate >= stack.last._1.rate - 1e-15) {
        val (b2, c2) = stack.remove(stack.size - 1)
        val (b1, c1) = stack.remove(stack.size - 1)
        stack += ((Block(b1.n + b2.n, b1.ys + b2.ys), c1 + c2))
      }
    }
    val pav = stack.flatMap { case (b, c) => Seq.fill(c)(b.rate) }
    assert(pav.size == out.size)
    out.map(_._4).zip(pav).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) <= 1e-8,
        s"bin $i: minimax $got != PAV $want")
    }
  }

  test("k-anonymity rows at risk are consistent and monotone in k") {
    val out = rows("etl_k_anonymity")
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("n_groups")),
        r.getLong(r.fieldIndex("n_groups_below")),
        r.getLong(r.fieldIndex("rows_at_risk")),
        r.getDouble(r.fieldIndex("risk_pct")))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(2L, 5L, 10L))
    // group universe identical across k rows; risk monotone in k
    assert(out.map(_._2).distinct.size == 1)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 && b._4 >= a._4, s"risk not monotone: $a -> $b")
    case _ => }
    out.foreach { case (_, _, gb, rar, pct) =>
      assert(rar >= gb, "each below-k group has >= 1 row")
      assert(pct >= 0 && pct <= 1)
    }
  }

  test("lead-lag cross-correlations are valid r and lag 0 matches a direct Pearson") {
    val out = rows("time_crosscorr_leadlag")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 15)
    out.foreach { case (lag, n, r) =>
      assert(n > 2, s"lag $lag spine too short")
      assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9, s"lag $lag r=$r")
    }
    // scala replay at lag 0
    import org.apache.spark.sql.functions._
    val daily = ops.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
    val v = daily.filter(_._2 == "view").map(t => t._1 -> t._3).toMap
    val pch = daily.filter(_._2 == "purchase").map(t => t._1 -> t._3).toMap
    val keys = v.keySet intersect pch.keySet
    val xs = keys.toSeq.sorted.map(k => (v(k).toDouble, pch(k).toDouble))
    val n = xs.size.toDouble
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map(t => t._1 * t._2).sum
    val sxx = xs.map(t => t._1 * t._1).sum; val syy = xs.map(t => t._2 * t._2).sum
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = out.find(_._1 == 0L).get._3
    assert(math.abs(got - want) <= 1e-6, s"lag0 $got vs $want")
  }
  test("conformal interval: coverage near the 90% guarantee, q is the exact order stat") {
    val r = rows("stat_conformal_interval").head
    val cov = r.getDouble(r.fieldIndex("coverage"))
    // finite-sample guarantee: coverage >= 0.9 - 1/(n_test+1) in
    // expectation; the fixture should land in a generous band
    assert(cov >= 0.82 && cov <= 0.98, s"coverage $cov")
    val nc = r.getLong(r.fieldIndex("n_calib"))
    val nt = r.getLong(r.fieldIndex("n_test"))
    assert(nc > 0 && nt > 0)
    assert(r.getDouble(r.fieldIndex("q_hat")) > 0)
    // no assertion on the slope's sign: the synthetic totalprice is
    // independent of the line-item count (measured slope < 0), and the
    // conformal guarantee holding ANYWAY is precisely the property
    // under test — coverage is distribution-free in the model
    assert(!r.getDouble(r.fieldIndex("slope")).isNaN)
  }

  test("SPRT llr replays from cumulative counts and decisions respect the boundaries") {
    val out = rows("stat_sprt_sequential")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(r.fieldIndex("llr")), r.getString(r.fieldIndex("decision"))))
      .sortBy(_._1)
    assert(out.nonEmpty)
    val c1 = math.log(0.52 / 0.48); val c0 = math.log(0.48 / 0.52)
    val lnA = math.log(0.05 / 0.95); val lnB = math.log(0.95 / 0.05)
    out.foreach { case (day, k, n, llr, dec) =>
      assert(k <= n, s"day $day: successes exceed trials")
      val want = k * c1 + (n - k) * c0
      assert(math.abs(llr - want) <= 1e-8, s"day $day: llr $llr != $want")
      val wantDec = if (want >= lnB) "accept_h1"
        else if (want <= lnA) "accept_h0" else "continue"
      assert(dec == wantDec, s"day $day: $dec != $wantDec (llr $want)")
    }
    // cumulative counts are monotone
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3)
    case _ => }
  }

  test("Granger F replays from the daily spine and nested RSS ordering holds") {
    val r = rows("time_granger_f").head
    val rss0 = r.getDouble(r.fieldIndex("rss_restricted"))
    val rss1 = r.getDouble(r.fieldIndex("rss_unrestricted"))
    val f = r.getDouble(r.fieldIndex("f_stat"))
    assert(rss1 <= rss0 + 1e-9, "adding a regressor cannot raise RSS")
    assert(f >= -1e-9)
    // scala replay: rebuild the lagged spine and both OLS fits
    import org.apache.spark.sql.functions._
    val daily = ops.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(x => (x.get(0).toString, x.getString(1), x.getLong(2)))
    val v = daily.filter(_._2 == "view").map(t => t._1 -> t._3).toMap
    val pch = daily.filter(_._2 == "purchase").map(t => t._1 -> t._3).toMap
    val days = pch.keySet.toSeq.sorted
    def d10(x: String) = java.time.LocalDate.parse(x.take(10))
    val spine = days.zip(days.drop(1)).flatMap { case (prev, cur) =>
      // the engine's lag join is on exact day offsets — only pair
      // genuinely consecutive dates
      if (d10(prev).plusDays(1) != d10(cur)) None
      else for (yl <- pch.get(prev); xl <- v.get(prev); yt <- pch.get(cur))
        yield (yt.toDouble, yl.toDouble, xl.toDouble)
    }
    val n = spine.size.toDouble
    def cMoment(f1: ((Double, Double, Double)) => Double,
                f2: ((Double, Double, Double)) => Double): Double =
      spine.map(t => f1(t) * f2(t)).sum - spine.map(f1).sum * spine.map(f2).sum / n
    val syy = cMoment(_._1, _._1); val szz = cMoment(_._2, _._2)
    val sxx = cMoment(_._3, _._3); val szy = cMoment(_._2, _._1)
    val sxy = cMoment(_._3, _._1); val szx = cMoment(_._2, _._3)
    val wantRss0 = syy - szy * szy / szz
    val det = szz * sxx - szx * szx
    val b1 = (sxx * szy - szx * sxy) / det
    val b2 = (szz * sxy - szx * szy) / det
    val wantRss1 = syy - b1 * szy - b2 * sxy
    val wantF = (wantRss0 - wantRss1) / (wantRss1 / (n - 3.0))
    assert(math.abs(rss0 - wantRss0) <= 1e-4 * math.max(1, wantRss0.abs),
      s"rss0 $rss0 vs $wantRss0")
    assert(math.abs(f - wantF) <= 1e-5 * math.max(1, wantF.abs),
      s"F $f vs $wantF")
  }
  test("Kneser-Ney probabilities replay and the continuation count is the point") {
    val out = rows("text_kneser_ney")
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getDouble(r.fieldIndex("p_kn"))
      assert(p > 0 && p <= 1.0 + 1e-9, s"${r.getString(2)}: p_kn $p")
      // replay the smoothing formula from the carried counts
      val cBg = r.getLong(r.fieldIndex("c_bg")).toDouble
      val cLeft = r.getLong(r.fieldIndex("c_left")).toDouble
      val nFollow = r.getLong(r.fieldIndex("n_follow")).toDouble
      val nPrecede = r.getLong(r.fieldIndex("n_precede")).toDouble
      // n_types is not carried; recover it from the formula inversion
      // only when lambda > 0 — instead assert the DISCOUNTED part alone
      // lower-bounds p and the full p exceeds it iff continuation mass
      // exists (nPrecede >= 1 always, so strictly greater)
      val disc = math.max(cBg - 0.75, 0.0) / cLeft
      assert(p > disc - 1e-9, s"p_kn below its discounted term")
      assert(nFollow >= 1 && nPrecede >= 1 && cLeft >= cBg)
    }
    // within each lang, ranks are 1..k and p_kn nonincreasing
    out.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.size).toSeq,
        s"$lang ranks not 1..k")
      val ps = byRank.map(_.getDouble(byRank.head.fieldIndex("p_kn")))
      ps.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9,
        s"$lang p_kn not nonincreasing")
      case _ => }
    }
  }

  test("IPF raking converges both marginals to their uniform targets") {
    val out = rows("agg_ipf_raking")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(r.fieldIndex("cell_weight"))))
    assert(out.nonEmpty)
    val total = out.map(_._3).sum.toDouble
    val nLang = out.map(_._1).distinct.size
    val nBuck = out.map(_._2).distinct.size
    val tLang = total / nLang; val tBuck = total / nBuck
    // after 3 iterations the LAST scaling was by bucket, so bucket
    // marginals are exact; language marginals are within 1% relative
    out.groupBy(_._2).foreach { case (b, rs) =>
      val m = rs.map(_._4).sum
      assert(math.abs(m - tBuck) <= 1e-6 * tBuck, s"bucket $b marginal $m != $tBuck")
    }
    out.groupBy(_._1).foreach { case (l, rs) =>
      val m = rs.map(_._4).sum
      assert(math.abs(m - tLang) <= 0.01 * tLang, s"lang $l marginal $m vs $tLang")
    }
    out.foreach { case (_, _, n, w) => assert(w > 0 && n > 0) }
  }
  test("Shapley attribution satisfies efficiency and matches a scala enumeration") {
    val out = rows("agg_shapley_channel")
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("view", "click", "signup"))
    // rebuild exposure masks and v(S) in scala, then enumerate all 3!
    // channel orderings and average marginal contributions — the
    // DEFINITION of the Shapley value, not the weighted-sum shortcut
    // the query uses
    import org.apache.spark.sql.functions._
    val ev = ops.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val firstBuy = ev.filter(_._3 == "purchase").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._2).min }
    val masks = firstBuy.map { case (u, fp) =>
      val pre = ev.filter(e => e._1 == u && e._2 < fp).map(_._3).toSet
      (if (pre("view")) 1 else 0) | (if (pre("click")) 2 else 0) |
        (if (pre("signup")) 4 else 0)
    }.toSeq
    def v(sMask: Int): Long = masks.count(m => (m & ~sMask & 7) == 0).toLong
    val bits = Map("view" -> 1, "click" -> 2, "signup" -> 4)
    val perms = Seq("view", "click", "signup").permutations.toSeq
    val phi = bits.keys.map { ch =>
      val contribs = perms.map { p =>
        val before = p.takeWhile(_ != ch).map(bits).fold(0)(_ | _)
        (v(before | bits(ch)) - v(before)).toDouble
      }
      ch -> contribs.sum / perms.size
    }.toMap
    phi.foreach { case (ch, want) =>
      assert(math.abs(out(ch) - want) <= 1e-9, s"$ch: ${out(ch)} vs $want")
    }
    // efficiency axiom: credits sum exactly to v(full) - v(empty)
    val total = out.values.sum
    assert(math.abs(total - (v(7) - v(0))) <= 1e-6,
      s"efficiency broken: $total != ${v(7) - v(0)}")
  }
  test("Deming slope solves its quadratic and exceeds OLS in magnitude") {
    val r = rows("stat_deming_regression").head
    val ols = r.getDouble(r.fieldIndex("slope_ols"))
    val dem = r.getDouble(r.fieldIndex("slope_deming"))
    // Deming corrects OLS attenuation: with delta = 1 the orthogonal
    // slope is at least as steep as OLS (equality iff x is noiseless)
    assert(math.abs(dem) >= math.abs(ols) - 1e-9,
      s"deming $dem attenuated below ols $ols")
    // both finite and same sign (the fixture's view/purchase volumes
    // co-move through shared traffic)
    assert(!dem.isNaN && !ols.isNaN && dem * ols > 0)
  }

  test("VaR/CVaR: CVaR is at least as severe as VaR and replays from the tail") {
    val out = rows("window_var_cvar")
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getDouble(r.fieldIndex("var_95"))
      val c = r.getDouble(r.fieldIndex("cvar_95"))
      // the tail MEAN cannot be milder than its own boundary
      assert(c <= v + 1e-9, s"${r.getString(0)}: cvar $c above var $v")
      assert(r.getLong(r.fieldIndex("n_days")) >= 20)
    }
  }
}
