package graft

import org.apache.spark.sql.functions._
import graft.ops.{PipelineCache, StatQueries, Tables}

class StatQueriesSpec extends SparkTestBase {

  test("snapshot diff classifies every key consistently with the derivations") {
    val rows = StatQueries.etlSnapshotDiff(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (k, change) =>
      val inOld = k % 10 != 0
      val inNew = k % 7 != 0
      change match {
        case "added"   => assert(!inOld && inNew, s"key $k")
        case "deleted" => assert(inOld && !inNew, s"key $k")
        // price bumps only on keys ≡0 mod 3; status never changes
        case "changed" => assert(inOld && inNew && k % 3 == 0, s"key $k")
      }
    }
    // completeness: every key in exactly one snapshot must be reported
    val keys = Tables.orders(spark, sfDir).select("o_orderkey")
      .collect().map(_.getLong(0))
    val expected = keys.count(k => (k % 10 == 0) != (k % 7 == 0))
    assert(rows.count { case (_, c) => c == "added" || c == "deleted" } == expected)
  }

  test("regression pack agrees with Spark's built-in regr_slope/intercept") {
    val got = StatQueries.aggRegressionPack(spark, sfDir).collect()
    assert(got.nonEmpty)
    val ref = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(regr_slope(col("l_extendedprice"), col("l_discount")).as("slope"),
        regr_intercept(col("l_extendedprice"), col("l_discount")).as("icept"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap
    got.foreach { r =>
      val (slope, icept, r2) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val (rs, ri) = ref((r.getString(0), r.getString(1)))
      assert(math.abs(slope - rs) <= 1e-6 * math.abs(rs), s"slope $slope vs $rs")
      assert(math.abs(icept - ri) <= 1e-6 * math.abs(ri), s"icept $icept vs $ri")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2 out of range")
    }
  }

  test("MAD medians are members of their group's multiset and bounds hold") {
    val out = StatQueries.aggMadOutliers(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byGroup = Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { r =>
      val (g, n, med, mad, outliers) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      val xs = byGroup(g)
      assert(n == xs.length)
      // lower median = element at rank ⌈n/2⌉ (1-based) of the sorted group
      val expMed = xs((xs.length + 1) / 2 - 1)
      assert(math.round(med * 100) == expMed, s"$g: med $med vs ${expMed / 100.0}")
      assert(mad >= 0.0 && outliers >= 0 && outliers < n)
      // MAD-based outliers must be a minority by construction of the median
      assert(outliers * 2 < n, s"$g: $outliers outliers of $n")
    }
  }

  test("DQ profile agrees with direct per-column aggregates") {
    val prof = StatQueries.etlDqProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(prof.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_totalprice"))
    val orders = Tables.orders(spark, sfDir)
    val n = orders.count()
    prof.values.foreach { case (rows, nulls, distinct) =>
      assert(rows == n && nulls == 0 && distinct > 0 && distinct <= n)
    }
    assert(prof("o_orderkey")._3 == n, "key column must be fully distinct")
    val statuses = orders.select("o_orderstatus").distinct().count()
    assert(prof("o_orderstatus")._3 == statuses)
  }

  test("FK orphan audit reports zero orphans on the consistent fixture") {
    val rows = StatQueries.etlFkOrphanCheck(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq ==
      Seq("lineitem->orders", "lineitem->part", "orders->customer"))
    rows.foreach { case (rel, n, orphans) =>
      assert(n > 0, s"$rel: empty fact side")
      assert(orphans == 0, s"$rel: unexpected orphans $orphans")
    }
  }

  test("rolling anomaly flags match a scala recomputation per user window") {
    val rows = StatQueries.windowRollingAnomaly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val events = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    var anomalies = 0
    rows.foreach { r =>
      val (u, eid, v) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (mu, sd, flag) = (r.getDouble(3), r.getDouble(4), r.getBoolean(5))
      val seq = events(u)
      val idx = seq.indexWhere(_._2 == eid)
      assert(idx >= 5, "window must have 5 predecessors")
      val win = seq.slice(idx - 5, idx).map(_._3)
      val m = win.sum / 5.0
      assert(math.abs(mu - m) < 1e-6, s"user $u event $eid: mu $mu vs $m")
      assert(flag == (math.abs(v - mu) > sd * 2))
      if (flag) anomalies += 1
    }
    assert(anomalies > 0, "fixture produced no anomaly")
  }

  test("degree histogram mass equals the support-graph vertex count") {
    val hist = graft.ops.GraphQueries.graphDegreeHist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.nonEmpty)
    hist.foreach { case (deg, nv) => assert(deg >= 1 && nv >= 1) }
    assert(hist.map(_._2).sum > 0)
  }

  test("linear interpolation is exact on observed days and bounded on gaps") {
    val rows = StatQueries.windowInterpolateLinear(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    var gaps = 0
    byUser.foreach { case (_, rs) =>
      val seq = rs.sortBy(_.getLong(1))
      // spine endpoints are observed by construction
      assert(seq.head.getBoolean(2) && seq.last.getBoolean(2))
      seq.filter(!_.getBoolean(2)).foreach { r =>
        gaps += 1
        val day = r.getLong(1)
        val prev = seq.filter(x => x.getBoolean(2) && x.getLong(1) < day).last
        val next = seq.filter(x => x.getBoolean(2) && x.getLong(1) > day).head
        val (v0, v1, v) = (prev.getDouble(3), next.getDouble(3), r.getDouble(3))
        assert(v >= math.min(v0, v1) - 1e-9 && v <= math.max(v0, v1) + 1e-9,
          s"interp $v outside [$v0, $v1]")
      }
    }
    assert(gaps > 0, "fixture exercised no interpolated day")
  }

  test("CUSUM peak matches a sequential scalar replay of the recursion") {
    val got = SparkEntry.queries("window_cusum_drift")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.nonEmpty)
    // replay the ORIGINAL recursion s_i = max(0, s_{i-1} + x_i - k) —
    // the window form must agree with the sequential definition
    val events = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    got.foreach { case (uid, (n, peak, peakId, drifted)) =>
      val seq = events(uid).sortBy(_._2)
      assert(n == seq.length, s"user $uid event count")
      var s = BigDecimal(0)
      var best = BigDecimal(-1); var bestId = -1L
      seq.foreach { case (_, eid, v) =>
        val y = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP) - 50
        s = (s + y).max(BigDecimal(0))
        if (s > best) { best = s; bestId = eid }
      }
      assert(math.abs(best.toDouble - peak) < 1e-9, s"user $uid peak")
      assert(bestId == peakId, s"user $uid peak position")
      assert(drifted == (best > 400), s"user $uid drift flag")
    }
  }

  test("KS statistic on hash-halves is small, bounded, and balanced") {
    val rows = SparkEntry.queries("agg_ks_drift")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val totals = Tables.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (et, na, nb, ks) =>
      assert(na + nb == totals(et), s"$et: halves must partition the type")
      // md5 halves of one population: balanced and distributionally close
      assert(math.abs(na - nb) <= (na + nb) / 5, s"$et: lopsided split")
      assert(ks >= 0.0 && ks <= 1.0, s"$et: KS out of range")
      assert(ks < 0.25, s"$et: hash halves should not drift (ks=$ks)")
    }
  }

  test("count-min sketch never undercounts and is exact absent collisions") {
    val rows = SparkEntry.queries("sketch_countmin_error")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // the CMS one-sided guarantee: est = min over rows of bucket sums,
    // and every bucket sum includes the key's own contribution
    rows.foreach { case (uid, exact, est, over) =>
      assert(est >= exact, s"user $uid: est $est < exact $exact")
      assert(over == est - exact, s"user $uid: overcount column inconsistent")
    }
    // the exact counts must agree with a direct groupBy
    val direct = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (uid, exact, _, _) =>
      assert(direct(uid) == exact, s"user $uid exact mismatch")
    }
    PipelineCache.releaseAll()
  }

  test("weighted median matches a driver-side replay and sits inside the value range") {
    val data = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val got = StatQueries.aggWeightedPercentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == data.map(_._1).toSet)
    data.groupBy(_._1).foreach { case (flag, xs) =>
      // replay in cents/centi-units — exact integer arithmetic
      val sorted = xs.map(t => (math.round(t._2 * 100), math.round(t._3 * 100)))
        .sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0L
      val med = sorted.find { case (_, w) => cum += w; 2 * cum >= tot }.get._1
      assert(math.round(got(flag)._1 * 100) == med, s"flag $flag median")
      assert(math.round(got(flag)._2 * 100) == tot, s"flag $flag total weight")
    }
  }

  test("gini index is in [0,1) and matches a driver-side replay") {
    val data = Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_totalprice", "o_orderkey")
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2)))
    val got = StatQueries.aggGiniIndex(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    data.groupBy(_._1).foreach { case (pri, xs) =>
      val sorted = xs.sortBy(t => (t._2, t._3)).map(_._2)
      val n = sorted.length.toLong
      val s0 = sorted.map(BigInt(_)).sum
      val s1 = sorted.zipWithIndex.map { case (x, i) => BigInt(x) * (i + 1) }.sum
      val gini = (BigDecimal(2 * s1 - s0 * (n + 1)) / BigDecimal(s0 * n)).toDouble
      assert(got(pri)._1 == n)
      assert(math.abs(got(pri)._2 - gini) < 1e-12, s"$pri gini")
      assert(got(pri)._2 >= 0.0 && got(pri)._2 < 1.0)
    }
  }

  private def cents(d: Double): Long = math.round(d * 100)

  /** orders collected as (custkey, orderkey, epochMillis, cents),
    * tolerant of TIMESTAMP vs TIMESTAMP_NTZ parquet arrival. */
  private def orderRows(): Array[(Long, Long, Long, Long)] =
    Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect().map { r =>
        val ms = r.get(2) match {
          case t: java.sql.Timestamp => t.getTime
          case l: java.time.LocalDateTime =>
            l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        }
        (r.getLong(0), r.getLong(1), ms, cents(r.getDouble(3)))
      }

  test("max drawdown matches a per-customer scalar replay") {
    val got = StatQueries.windowDrawdown(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), cents(r.getDouble(2)), r.getLong(3))))
      .toMap
    val byCust = orderRows().groupBy(_._1)
    assert(got.size == byCust.size)
    byCust.foreach { case (cust, rows) =>
      val seq = rows.sortBy(r => (r._3, r._2))
      var runMax = Long.MinValue
      var bestDd = Long.MinValue
      var bestKey = Long.MaxValue
      seq.foreach { case (_, key, _, c) =>
        runMax = math.max(runMax, c)
        val dd = runMax - c
        // rank rule: (dd DESC, o_orderkey ASC) — ties keep the SMALLEST key
        if (dd > bestDd || (dd == bestDd && key < bestKey)) {
          bestDd = dd; bestKey = key
        }
      }
      val (nOrders, dd, trough) = got(cust)
      assert(nOrders == seq.length, s"cust $cust n_orders")
      assert(dd == bestDd, s"cust $cust drawdown")
      assert(trough == bestKey, s"cust $cust trough key")
    }
  }

  test("bollinger breaches equal the exact integer predicate replayed per window") {
    val got = StatQueries.windowBollingerBands(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    val expected = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    orderRows().groupBy(_._1).foreach { case (cust, rows) =>
      val seq = rows.sortBy(r => (r._3, r._2))
      for (i <- 5 until seq.length) {
        val win = seq.slice(i - 5, i).map(_._4)
        val s1 = win.sum
        val s2 = win.map(c => BigInt(c) * c).sum
        val x = seq(i)._4
        val diff = BigInt(5) * x - s1
        val varNum = BigInt(5) * s2 - BigInt(s1) * s1
        if (diff * diff > varNum * 4) expected((cust, seq(i)._2)) = (s1, x)
      }
    }
    assert(got.keySet == expected.keySet,
      s"breach sets differ: extra=${got.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- got.keySet}")
    got.foreach { case (k, (mean5, sigma5)) =>
      val (s1, _) = expected(k)
      assert(math.abs(mean5 - s1 / 500.0) < 1e-9, s"$k mean5")
      assert(sigma5 >= 0.0)
    }
  }

  test("simpson diversity matches the collision-probability replay per source") {
    val docs = Tables.documents(spark, sfDir).select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = StatQueries.aggSimpsonDiversity(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val n = rows.length.toLong
      val sumsq = rows.groupBy(_._2).values.map(g => g.size.toLong * g.size).sum
      val (nDocs, nLangs, simpson) = got(src)
      assert(nDocs == n && nLangs == rows.map(_._2).distinct.length)
      assert(math.abs(simpson - (n * n - sumsq).toDouble / (n * n).toDouble) < 1e-15)
      assert(simpson >= 0.0 && simpson < 1.0)
    }
  }

  test("u-shaped attribution reconciles exactly against total purchase revenue") {
    val out = StatQueries.windowAttributionUshaped(spark, sfDir).collect()
    val types = out.map(_.getString(0)).toSet
    assert(types.subsetOf(Set("click", "view", "none")))
    val attributedCents = out.map(r => cents(r.getDouble(2))).sum
    val totalCents = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("value").collect().map(r => cents(r.getDouble(0))).sum
    // integer-cent credits partition each purchase exactly — no epsilon
    assert(attributedCents == totalCents,
      s"attributed $attributedCents != purchases $totalCents")
  }

  test("benford digit profile: counts total, shares sum to 1, devs consistent") {
    val out = StatQueries.aggBenfordFirstDigit(spark, sfDir).collect()
    assert(out.map(_.getInt(0)).forall(d => d >= 1 && d <= 9))
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == nOrders)
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) - math.log10(1 + 1.0 / r.getInt(0))) < 1e-15)
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(3))) < 1e-15)
    }
  }

  test("TWAP matches an exact rational replay per user") {
    val got = StatQueries.windowTwap(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), cents(r.getDouble(2)), r.getLong(3)))
    rows.groupBy(_._2).foreach { case (uid, es) =>
      val seq = es.sortBy(e => (e._4, e._1))
      val intervals = seq.zip(seq.tail).map { case (a, b) => (a._3, b._4 - a._4) }
      val held = intervals.map(_._2).sum
      if (intervals.isEmpty || held == 0) assert(!got.contains(uid))
      else {
        val (n, h, twap) = got(uid)
        assert(n == intervals.length && h == held, s"user $uid counts")
        val numCents = intervals.map { case (c, dt) => BigInt(c) * dt }.sum
        // engine: exact decimal num → double, / double(held)
        val want = (BigDecimal(numCents) / 100).toDouble / held.toDouble
        assert(twap == want, s"user $uid twap $twap != $want")
      }
    }
  }

  test("survivorship merge: every golden-record field matches its rule replayed") {
    val out = graft.ops.EtlQueries.etlSurvivorshipMerge(spark, sfDir).collect()
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4), r.getLong(5)))
    val byUser = rows.groupBy(_._2)
    assert(out.map(_.getLong(0)).toSet == byUser.keySet)
    out.foreach { r =>
      val uid = r.getLong(0)
      val es = byUser(uid).sortBy(e => (e._6, e._1))
      assert(r.getLong(1) == es.length)
      assert(r.getLong(2) == es.map(_._6).min && r.getLong(3) == es.map(_._6).max)
      val lastPurch = es.filter(_._3 == "purchase").lastOption.map(_._4)
      if (lastPurch.isEmpty) assert(r.isNullAt(4))
      else assert(cents(r.getDouble(4)) == cents(lastPurch.get), s"user $uid purchase")
      val lastClick = es.filter(_._3 == "click").lastOption
        .map(e => "\"k\":\\s*(\\d+)".r.findFirstMatchIn(e._5).get.group(1).toInt)
      if (lastClick.isEmpty) assert(r.isNullAt(5))
      else assert(r.getInt(5) == lastClick.get, s"user $uid click k")
      val mode = es.groupBy(_._3).view.mapValues(_.size).toSeq
        .minBy { case (t, c) => (-c, t) }._1
      assert(r.getString(6) == mode, s"user $uid preferred type")
    }
  }

  test("month-over-month change matches an exact-cents replay") {
    val out = StatQueries.windowMomChange(spark, sfDir).collect()
    val rev = orderRows().map { case (_, key, ms, c) => (key, ms, c) }
    val pri = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val monthly = rev.groupBy { case (key, ms, _) =>
      val ld = java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      (pri(key), f"${ld.getYear}%04d-${ld.getMonthValue}%02d")
    }.view.mapValues(_.map(_._3).sum).toMap
    assert(out.length == monthly.size)
    val seen = scala.collection.mutable.Map.empty[String, Long] // pri -> prev cents
    out.foreach { r =>
      val (p, m) = (r.getString(0), r.getString(1))
      val c = monthly((p, m))
      assert(cents(r.getDouble(2)) == c, s"($p,$m) revenue")
      seen.get(p) match {
        case None => assert(r.isNullAt(3), s"($p,$m) first month must be null")
        case Some(prev) =>
          val want = ((c - prev) / 100.0) / (prev / 100.0)
          assert(math.abs(r.getDouble(3) - want) < 1e-12, s"($p,$m) mom")
      }
      seen(p) = c
    }
  }

  test("interpolated percentiles match a sorted-array quarter-grid replay") {
    val out = StatQueries.aggPercentileInterp(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val vals = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    vals.groupBy(_._1).foreach { case (flag, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      for (q <- 1 to 3) {
        val pos4 = (n - 1).toLong * q
        val lo = (pos4 / 4).toInt; val f = pos4 % 4
        val hi = if (f > 0) lo + 1 else lo
        val want = (sorted(lo) * (4 - f) + sorted(hi) * f).toDouble / 400.0
        assert(out((flag, q * 25)) == want, s"$flag p${q * 25}")
      }
    }
  }

  test("streaks match a scala gaps-and-islands replay per user") {
    val out = graft.ops.AggWindowQueries.windowStreaks(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val epoch = java.time.LocalDate.parse("2024-01-01")
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date")).collect()
      .map(r => (r.getLong(0),
        java.time.temporal.ChronoUnit.DAYS.between(epoch, r.getDate(1).toLocalDate)))
      .distinct
    days.groupBy(_._1).foreach { case (uid, ds) =>
      val sorted = ds.map(_._2).sorted
      var bestLen = 0L; var bestStart = Long.MaxValue
      var runLen = 0L; var runStart = 0L
      sorted.zipWithIndex.foreach { case (day, i) =>
        if (i == 0 || day != sorted(i - 1) + 1) { runLen = 0; runStart = day }
        runLen += 1
        if (runLen > bestLen) { bestLen = runLen; bestStart = runStart }
      }
      val (nActive, longest, start) = out(uid)
      assert(nActive == sorted.length && longest == bestLen &&
        start == bestStart, s"user $uid streaks")
    }
  }

  test("lang-id confusion matrix is a partition of the corpus with unit row shares") {
    val out = graft.ops.TextQueries.textLangidConfusion(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byLang = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum == byLang(lang), s"$lang row total")
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12, s"$lang shares")
    }
    assert(out.map(_._3).sum == byLang.values.sum)
    assert(out.map(_._2).toSet.subsetOf(Set("generic", "sqlish", "dataish")))
  }

  test("sync checksums: scala replay matches; a single-row mutation is localized") {
    val out = graft.ops.EtlQueries.etlSyncChecksums(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), cents(r.getDouble(2))))
    def fold32(sIn: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(8).foldLeft(0L)((acc, c) =>
        acc * 16 + java.lang.Long.parseLong(c.toString, 16))
    }
    def sums(rs: Seq[(Long, String, Long)]): Map[Long, (Long, Long)] =
      rs.groupBy(_._1 % 32).view.mapValues { g =>
        (g.size.toLong, g.map(r => fold32(s"${r._1}|${r._2}|${r._3}")).sum)
      }.toMap
    val replay = sums(rows.toSeq)
    assert(out == replay, "engine checksums differ from scala replay")
    // mutate one row's cents: exactly that row's bucket must change
    val mutated = rows.toSeq.updated(0, rows(0).copy(_3 = rows(0)._3 + 1))
    val after = sums(mutated)
    val changed = replay.keySet.filter(b => replay(b) != after(b))
    assert(changed == Set(rows(0)._1 % 32), s"mutation not localized: $changed")
  }

  test("hopping windows: 4x replication mass and per-window membership") {
    val out = graft.ops.ScalarQueries.timeBucketHopping(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).forall(_ % 900 == 0))
    val nEvents = Tables.events(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == 4 * nEvents)
    // spot-check: every window's n equals a direct range-filter count
    val ev = Tables.events(spark, sfDir)
      .select(unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
      .collect().map(_.getLong(0))
    out.sortBy(_.getLong(0)).take(8).foreach { r =>
      val ws = r.getLong(0)
      assert(r.getLong(1) == ev.count(s => s >= ws && s < ws + 3600),
        s"window $ws count")
    }
  }
}
