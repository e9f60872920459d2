package graft

import org.apache.spark.sql.functions._
import graft.ops.{DecisionQueriesB, Tables}

/** Brute-force re-derivations of decision-support suite B at sf0.001:
  * literal per-row scans replace the engine's joins/aggregations and
  * the results compare exactly (integer cents / integer counts). The
  * DuckDB oracle is the cross-engine check; these pin semantics against
  * an independent in-process construction.
  */
class DecisionQueriesBSpec extends SparkTestBase {

  private def cents(d: Double): Long =
    new java.math.BigDecimal(d).setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  // revenue in integer cents×100 (price cents × (100 - discount%·100)/100)
  // — replay rev = price·(1-disc) exactly: cents(price)·(100-cents2(disc))
  // where disc has 2 decimals ⇒ disc·100 integral
  private def revMicro(price: Double, disc: Double): BigInt =
    BigInt(cents(price)) * (100 - cents(disc))

  test("priority-late-exists counts match a literal per-order EXISTS scan") {
    // epoch-second casts keep the replay free of JVM date-API variance
    val lines = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate").cast("timestamp").cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = Tables.orders(spark, sfDir)
      .filter(expr("o_orderdate >= TIMESTAMP '1997-01-01'") &&
        expr("o_orderdate < TIMESTAMP '1998-01-01'"))
      .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long").as("t"),
        col("o_orderpriority"))
      .collect()
      .filter { r =>
        val cut = r.getLong(1) + 90L * 86400L
        lines.getOrElse(r.getLong(0), Array.empty[Long]).exists(_ > cut)
      }
      .groupBy(_.getString(2)).view.mapValues(_.size.toLong).toMap
    val got = DecisionQueriesB.dsqPriorityLateExists(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("nation-pair volume is symmetric-complete and matches an integer tally") {
    val nation = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    val suppN = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
      .collect().map(r => (r.getLong(0), nation(r.getInt(1)))).toMap
    val custN = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
      .collect().map(r => (r.getLong(0), nation(r.getInt(1)))).toMap
    val custOfOrder = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pair = Set("NATION_9", "NATION_3")
    val tally = scala.collection.mutable.Map.empty[(String, String, Int), BigInt]
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("y"), col("l_extendedprice"), col("l_discount"))
      .collect().foreach { r =>
        val sn = suppN(r.getLong(1))
        val cn = custN(custOfOrder(r.getLong(0)))
        if (pair(sn) && pair(cn) && sn != cn) {
          val k = (sn, cn, r.getInt(2))
          tally(k) = tally.getOrElse(k, BigInt(0)) +
            revMicro(r.getDouble(3), r.getDouble(4))
        }
      }
    val got = DecisionQueriesB.dsqNationPairVolume(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)),
        BigInt(cents(r.getDouble(3))) * 100)).toMap
    // the replay keeps rev in cents×100 (exact); engine output is cents
    assert(got.keySet == tally.keySet)
    tally.foreach { case (k, v) =>
      // engine rounds the exact decimal sum to cents on output
      val diff = (got(k) - v).abs
      assert(diff <= 50, s"$k off by $diff micro-cents")
    }
    // directions only ever involve the two pair nations, never equal
    assert(got.keySet.forall { case (sn, cn, _) =>
      pair(sn) && pair(cn) && sn != cn })
  }

  test("large orders: every result exceeds the threshold and the top-100 cut is exact") {
    val perOrder = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val qualifying = perOrder.filter(_._2 > 250 * 100)
    val got = DecisionQueriesB.dsqLargeOrders(spark, sfDir).collect()
      .map(r => (r.getLong(2), cents(r.getDouble(5))))
    assert(got.forall { case (_, q) => q > 250 * 100 })
    assert(got.map(_._1).toSet.subsetOf(qualifying.keySet))
    assert(got.length == math.min(100, qualifying.size))
    got.foreach { case (ok, q) => assert(q == qualifying(ok)) }
    // verify the DESC-by-qty cut: nothing excluded is strictly larger
    // than the smallest included
    if (got.nonEmpty && qualifying.size > got.length) {
      val minIncluded = got.map(_._2).min
      val excludedMax = (qualifying -- got.map(_._1)).values.max
      assert(excludedMax <= minIncluded)
    }
  }

  test("dominant supplier: qualifying set matches a literal share scan") {
    val byPartSupp = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), cents(r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val totByPart = byPartSupp.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val expected = byPartSupp.collect {
      case ((p, su), q) if 5 * q > totByPart(p) => su
    }.toSet
    val got = DecisionQueriesB.dsqDominantSupplier(spark, sfDir).collect()
      .map(_.getLong(0))
    assert(got.toSet == expected)
    assert(got.sorted.sameElements(got), "output must be sorted by suppkey")
  }

  test("promo effect: ratio components are consistent and bounded") {
    val rows = DecisionQueriesB.dsqPromoEffect(spark, sfDir).collect()
    assert(rows.length == 12, "one row per 1997 ship month")
    rows.foreach { r =>
      val (pct, promo, tot) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(promo >= 0 && promo <= tot)
      assert(math.abs(pct - promo * 100.0 / tot) < 1e-9)
    }
  }

  test("disjunctive revenue equals the sum of the three disjoint-branch queries") {
    // the three conjunctions hit disjoint part sets (distinct brands),
    // so branch-wise totals must sum exactly to the disjunctive total
    val branches = Seq(
      ("Brand#12", (1, 15), (1.0, 11.0)),
      ("Brand#23", (1, 25), (10.0, 20.0)),
      ("Brand#25", (1, 35), (20.0, 30.0)))
    val partMeta = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand", "p_size")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    var total = BigInt(0)
    var nLines = 0L
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .collect().foreach { r =>
        val (brand, size) = partMeta(r.getLong(0))
        val qty = r.getDouble(1)
        val hit = branches.exists { case (b, (s0, s1), (q0, q1)) =>
          brand == b && size >= s0 && size <= s1 && qty >= q0 && qty <= q1 }
        if (hit) { total += revMicro(r.getDouble(2), r.getDouble(3)); nLines += 1 }
      }
    val row = DecisionQueriesB.dsqDisjunctiveRev(spark, sfDir).collect().head
    assert(row.getLong(1) == nLines)
    assert((BigInt(cents(row.getDouble(0))) * 100 - total).abs <= 50)
  }

  test("forecast revenue matches a literal per-line replay in integer units") {
    val cutLo = java.time.LocalDateTime.parse("1997-01-01T00:00:00")
    val cutHi = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    // l_shipdate arrives as java.sql.Timestamp (TIMESTAMP corpus) or
    // java.time.LocalDateTime (TIMESTAMP_NTZ corpus) depending on the
    // parquet layout version — compare wall-clock either way
    def wall(v: Any): java.time.LocalDateTime = v match {
      case ldt: java.time.LocalDateTime => ldt
      case t: java.sql.Timestamp        => t.toLocalDateTime
      case other => fail(s"unexpected l_shipdate type: ${other.getClass}")
    }
    var micro = BigInt(0)
    var n = 0L
    Tables.lineitem(spark, sfDir)
      .select("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .collect().foreach { r =>
        val t = wall(r.get(0))
        val disc = cents(r.getDouble(1)) // discount in hundredths
        if (!t.isBefore(cutLo) && t.isBefore(cutHi) && disc >= 5 && disc <= 7 &&
            r.getDouble(2) < 24) {
          // revenue term = price · discount: cents × hundredths = 10⁻⁴ units
          micro += BigInt(cents(r.getDouble(3))) * disc
          n += 1
        }
      }
    val row = DecisionQueriesB.dsqForecastRevenue(spark, sfDir).collect().head
    assert(row.getLong(1) == n)
    // revenue carries 4 decimal places (cents × hundredths) — compare in
    // 10⁻⁴ units, not cents, or the last two digits vanish
    assert(BigInt(math.round(row.getDouble(0) * 10000)) == micro,
      s"revenue ${row.getDouble(0)} vs replay $micro micro-units")
  }

  test("basket lift agrees with a driver-side association-rule replay") {
    val out = DecisionQueriesB.dsqBasketLift(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val items = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nB = items.map(_._1).distinct.length
    val ic = items.groupBy(_._2).view.mapValues(_.length).toMap
    val pairCnt = items.groupBy(_._1).values.toSeq.flatMap { basket =>
      val ps: Seq[Long] = basket.map(_._2).toSeq.sorted
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.length).toMap
    out.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val cab = pairCnt((a, b))
      assert(r.getLong(2) == cab && cab >= 3, s"pair ($a,$b) support")
      assert(r.getLong(3) == ic(a) && r.getLong(4) == ic(b))
      assert(r.getDouble(5) == cab.toDouble / ic(a), s"($a,$b) confidence")
      assert(r.getDouble(6) ==
        (cab.toDouble * nB.toDouble) / (ic(a).toDouble * ic(b).toDouble),
        s"($a,$b) lift")
    }
    // descending lift with (a, b) tiebreaks
    out.sliding(2).foreach {
      case Array(x, y) =>
        val tieOrdered = x.getLong(0) < y.getLong(0) ||
          (x.getLong(0) == y.getLong(0) && x.getLong(1) < y.getLong(1))
        assert(x.getDouble(6) > y.getDouble(6) ||
          (x.getDouble(6) == y.getDouble(6) && tieOrdered))
      case _ =>
    }
  }

  test("min-cost supplier rows achieve their part's true minimum over eligible suppliers") {
    val out = DecisionQueriesB.dsqMinCostSupplier(spark, sfDir).collect()
    assert(out.nonEmpty)
    // replay: eligible = suppliers in EUROPE; min unit cost per part
    val nations = Tables.nation(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
    val eurRegion = Tables.region(spark, sfDir).collect()
      .collectFirst { case r if r.getString(1) == "EUROPE" => r.getInt(0) }.get
    val eurSupp = Tables.supplier(spark, sfDir).collect()
      .filter(r => nations(r.getInt(2)) == eurRegion).map(_.getLong(0)).toSet
    val minCost = scala.collection.mutable.Map.empty[Long, Double]
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .collect().foreach { r =>
        if (eurSupp(r.getLong(1))) {
          val u = r.getDouble(2) / r.getDouble(3)
          val k = r.getLong(0)
          if (!minCost.contains(k) || u < minCost(k)) minCost(k) = u
        }
      }
    out.foreach { r =>
      assert(r.getDouble(6) == minCost(r.getLong(0)),
        s"part ${r.getLong(0)}: ${r.getDouble(6)} != min ${minCost(r.getLong(0))}")
    }
    // every result part qualifies (LARGE, size <= 10)
    val qual = Tables.part(spark, sfDir).collect()
      .filter(r => r.getString(3) == "LARGE" && r.getInt(4) <= 10)
      .map(_.getLong(0)).toSet
    out.foreach(r => assert(qual(r.getLong(0))))
  }
}
