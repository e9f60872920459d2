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
}
