package graft

import org.apache.spark.sql.functions._
import graft.ops.{AggWindowQueries, CurationQueries, Tables, TextQueries}

/** Round-6 pipeline operators: chunk-level dedup, bigram-LM scoring,
  * DSIR importance weights, daily-series autocorrelation. */
class PipelineOpsSpec extends SparkTestBase {

  test("chunk dedup: exact-duplicate docs have every chunk flagged as dup") {
    val rows = TextQueries.textChunkDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, dup, kept) =>
      assert(dup >= 0 && dup <= n, s"doc $id: dup $dup outside [0,$n]")
      assert(kept == (n - dup) * 10, s"doc $id: kept_tokens mismatch")
    }
    // differential: recompute per-doc dup-chunk counts from scratch on the
    // driver (collect the tiny fixture, cut chunks, count globally)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def chunksOf(text: String): Seq[String] = {
      val tok = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (0 until tok.length / 10).map(i => tok.slice(i * 10, i * 10 + 10).mkString(" "))
    }
    val all = docs.flatMap { case (id, t) => chunksOf(t).map(c => (id, c)) }
    val occ = all.groupBy(_._2).map { case (c, xs) => c -> xs.length }
    val refDup = all.groupBy(_._1).map { case (id, xs) =>
      id -> xs.count(x => occ(x._2) > 1).toLong
    }
    assert(refDup.values.sum > 0, "fixture produced no duplicated chunk at all")
    rows.foreach { case (id, _, dup, _) =>
      assert(dup == refDup.getOrElse(id, -1L),
        s"doc $id: engine dup $dup vs reference ${refDup.get(id)}")
    }
  }

  test("bigram LM score: probabilities bounded and match a driver reference") {
    val rows = TextQueries.textLmBigramScore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nb, p) =>
      assert(nb >= 1, s"doc $id: no bigrams")
      assert(p > 0.0 && p <= 1.0, s"doc $id: avg transition p $p outside (0,1]")
    }
    // differential: recompute the smoothed mean transition probability on
    // the driver from the collected fixture
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
    val vocab = docs.flatMap(_._2).distinct.length
    val bigrams = docs.flatMap { case (_, t) => t.zip(t.drop(1)) }
    val cb = bigrams.groupBy(identity).map { case (k, v) => k -> v.length }
    val cl = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length }
    val ref = docs.filter(_._2.length >= 2).map { case (id, t) =>
      val terms = t.zip(t.drop(1)).map(b =>
        (cb(b) + 1).toDouble / (cl(b._1) + vocab).toDouble)
      id -> terms.sum / terms.length
    }.toMap
    rows.foreach { case (id, _, p) =>
      val r = ref(id)
      assert(math.abs(p - r) < 1e-12, s"doc $id: engine $p vs reference $r")
    }
  }

  test("DSIR weights: target slice skews above 1, others below") {
    val rows = CurationQueries.curationDsirWeights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.length > 0)
    rows.foreach { case (id, _, n, w, sel) =>
      assert(n >= 1)
      assert(w > 0.0, s"doc $id: non-positive weight $w")
      assert(sel == (w > 1.0), s"doc $id: selected flag inconsistent")
    }
    val (tgt, rest) = rows.partition(_._2 == "src0")
    assert(tgt.nonEmpty && rest.nonEmpty)
    val meanT = tgt.map(_._4).sum / tgt.length
    val meanR = rest.map(_._4).sum / rest.length
    assert(meanT > meanR,
      s"target docs do not skew toward target distribution: $meanT <= $meanR")
  }

  test("weekday profile: per-type shares sum to 1 and counts reconcile") {
    val rows = AggWindowQueries.timeWeekdayProfile(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, dow, n, _, share) =>
      assert(dow >= 1 && dow <= 7)
      assert(n >= 1)
      assert(share > 0.0 && share <= 1.0)
    }
    val total = Tables.events(spark, sfDir).count()
    assert(rows.map(_._3).sum == total, "weekday cells must cover every event")
    rows.groupBy(_._1).foreach { case (t, cells) =>
      val s = cells.map(_._5).sum
      assert(math.abs(s - 1.0) < 1e-9, s"$t: shares sum to $s")
    }
  }

  test("rolling correlation: bounded, dated, and matches a driver reference") {
    val rows = AggWindowQueries.windowRollingCorr(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.foreach { case (d, _, _, c) =>
      c.foreach(v => assert(math.abs(v) <= 1.0 + 1e-12, s"$d: |corr| $v > 1"))
    }
    // driver reference over the collected daily series
    val daily = rows.map(r => (r._1, r._2, r._3)).sortBy(_._1)
    // rows only contain days from rank 7 on; rebuild the full series
    val full = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("d"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(daily.length == full.length - 6)
    rows.foreach { case (d, _, _, c) =>
      val i = full.indexWhere(_._1 == d)
      val win = full.slice(i - 6, i + 1)
      val xs = win.map(_._2.toDouble); val ys = win.map(_._3.toDouble)
      val mx = xs.sum / 7; val my = ys.sum / 7
      val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum)
      if (den > 0)
        assert(math.abs(c.get - num / den) < 1e-9,
          s"$d: engine ${c.get} vs reference ${num / den}")
      else assert(c.isEmpty, s"$d: zero-variance frame must be NULL")
    }
  }

  test("chi-square independence: single row, exact reconciliation vs driver") {
    val row = AggWindowQueries.aggChisqIndependence(spark, sfDir).collect()
    assert(row.length == 1)
    val (nCells, dof, chi2) =
      (row(0).getLong(0), row(0).getLong(1), row(0).getDouble(2))
    assert(nCells >= 1 && dof >= 1 && chi2 >= 0.0)
    // driver reference from the collected contingency table
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"),
        (weekday(col("ts")) + 1).cast("long").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val n = cells.map(_._2).sum.toDouble
    val rt = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val ct = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val ref = cells.map { case ((t, w), o) =>
      val e = rt(t) * ct(w) / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(chi2 - ref) < 1e-6, s"engine $chi2 vs reference $ref")
    assert(dof == (rt.size - 1).toLong * (ct.size - 1))
    assert(nCells == cells.length)
  }

  test("rolling median: exact middle of each trailing 7-day frame") {
    val rows = AggWindowQueries.windowRollingMedian(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    rows.foreach { case (d, _, med) =>
      val i = daily.indexWhere(_._1 == d)
      assert(i >= 6)
      val ref = daily.slice(i - 6, i + 1).map(_._2).sorted.apply(3)
      assert(med == ref, s"$d: engine median $med vs reference $ref")
    }
  }

  test("Theil-Sen: slope/intercept match a driver pairwise-median reference") {
    val row = AggWindowQueries.trendTheilsenDaily(spark, sfDir).collect()
    assert(row.length == 1)
    val (nDays, nPairs, slope, ic) = (row(0).getLong(0), row(0).getLong(1),
      row(0).getDouble(2), row(0).getDouble(3))
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
      .sortBy(_._1)
    val d0 = daily.map(_._1).min
    val pts = daily.map { case (t, y) => ((t - d0) / 86400000L, y) }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val m = s.length
      if (m % 2 == 1) s(m / 2) else (s(m / 2 - 1) + s(m / 2)) / 2
    }
    val slopes = for {
      i <- pts.indices; j <- pts.indices if pts(j)._1 > pts(i)._1
    } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1).toDouble
    assert(nDays == pts.length && nPairs == slopes.length)
    val refSlope = median(slopes.toSeq)
    assert(math.abs(slope - refSlope) < 1e-12, s"slope $slope vs $refSlope")
    val refIc = median(pts.map { case (d, y) => y - refSlope * d }.toSeq)
    assert(math.abs(ic - refIc) < 1e-9, s"intercept $ic vs $refIc")
  }

  test("SCC of pivot matches a driver forward-backward reachability reference") {
    val members = graft.ops.GraphQueries.graphSccPivot(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(members.nonEmpty)
    // driver reference: rebuild the add-next edge list and run plain BFS
    // both ways from the same pivot
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o").orderBy("ln", "src")
    val edges = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_linenumber").as("ln"),
        col("l_partkey").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull && col("dst") =!= col("src"))
      .select("src", "dst").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pivot = edges.groupBy(_._1).map { case (k, v) => (k, v.length) }
      .toSeq.sortBy { case (k, n) => (-n, k) }.head._1
    def closure(adj: Map[Long, Seq[Long]]): Set[Long] = {
      var seen = Set(pivot); var frontier = Set(pivot)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(x => adj.getOrElse(x, Nil)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    val fwd = closure(edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq })
    val bwd = closure(edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSeq })
    assert(members == (fwd & bwd), "engine SCC differs from driver reference")
    assert(members.contains(pivot))
  }

  test("MIPS augmentation: augmented-L2 ranking equals plain inner-product ranking") {
    val rows = graft.ops.SimilarityQueries.simMipsAugmented(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 10)
    // ranking by aug_l2sq ascending must equal ranking by ip descending
    val byAug = rows.map(_._1).toSeq
    val byIp = rows.sortBy { case (id, ip, _) => (-ip, id) }.map(_._1).toSeq
    assert(byAug == byIp, "augmented-L2 order differs from inner-product order")
    // independent brute-force dot top-10 on the driver
    val embs = Tables.embeddings(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val q = embs.find(_._1 == 1L).get._2
    val ref = embs.filter(_._1 != 1L)
      .map { case (id, v) => (id, v.zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, ip) => (-ip, id) }.take(10).map(_._1).toSeq
    assert(byAug == ref, s"engine $byAug vs driver reference $ref")
  }

  test("bootstrap CI: ordered quantiles bracketing the true mean") {
    val row = graft.ops.StatQueries.statBootstrapCi(spark, sfDir).collect()
    assert(row.length == 1)
    val (n, p5, p50, p95) = (row(0).getLong(0), row(0).getDouble(1),
      row(0).getDouble(2), row(0).getDouble(3))
    assert(n == 64)
    assert(p5 <= p50 && p50 <= p95)
    val truth = Tables.orders(spark, sfDir)
      .agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(p5 < truth && truth < p95,
      s"CI [$p5, $p95] does not bracket the true mean $truth")
    // the CI should be TIGHT around the mean at n≈1500 (width ≈ 3.3σ/√n)
    assert((p95 - p5) / truth < 0.2, s"implausibly wide CI [$p5, $p95]")
  }

  test("RAKE keyphrases: scores agree with a driver reference") {
    val rows = graft.ops.TextQueries.textRakeKeyphrases(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows.length == 20)
    // driver reference over the collected fixture
    val docs = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val stop = Set("the", "a")
    val phrases = docs.flatMap { t =>
      val runs = collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.empty[String]
      t.foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur = w :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs.filter(_.length <= 4)
    }
    val freq = phrases.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val degree = phrases.flatMap(p => p.map(w => w -> p.length))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    def score(p: Seq[String]): Double =
      p.map(w => degree(w).toDouble / freq(w)).sum
    val ref = phrases.map(p => p.mkString(" ") -> p).toMap
    rows.foreach { case (phrase, sc, nOcc) =>
      val p = ref(phrase)
      assert(math.abs(sc - score(p)) < 1e-9,
        s"$phrase: engine $sc vs reference ${score(p)}")
      assert(nOcc == phrases.count(_ == p))
    }
  }

  test("autocorr: one row per lag, |r| bounded, pair counts shrink with lag") {
    val rows = AggWindowQueries.timeAutocorr(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    rows.foreach { case (k, m, r) =>
      assert(m >= 2, s"lag $k: too few pairs")
      assert(math.abs(r) <= 1.0 + 1e-12, s"lag $k: |autocorr| $r > 1")
    }
    val ms = rows.sortBy(_._1).map(_._2)
    assert(ms.zip(ms.tail).forall { case (a, b) => b <= a },
      "pair counts must weakly decrease with lag")
  }
}
