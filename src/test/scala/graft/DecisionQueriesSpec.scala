package graft

import org.apache.spark.sql.functions._
import graft.ops.{DecisionQueries, Tables}

/** Brute-force re-derivations of the decision-support suite at sf0.001:
  * each test recomputes the query's answer driver-side from the raw
  * tables with a DIFFERENT algorithm (literal per-row scans instead of
  * joins/aggregations) and compares exactly. The DuckDB oracle is the
  * cross-engine check; these pin the semantics against an independent
  * in-process construction.
  */
class DecisionQueriesSpec extends SparkTestBase {

  private def cents(d: Double): Long =
    new java.math.BigDecimal(d).setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  test("custdist: counts-of-counts match a driver-side tally incl. zero-order customers") {
    val custs = Tables.customer(spark, sfDir).select("c_custkey")
      .collect().map(_.getLong(0))
    val ordersPerCust = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") =!= "F").select("o_custkey")
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = custs.map(c => ordersPerCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

    val got = DecisionQueries.dsqCustdist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    // every customer lands in exactly one bucket — an inner join would
    // silently drop the zero-order customers from this total
    assert(got.values.sum == custs.length.toLong,
      "bucket totals != |customer|: outer join dropped rows")
  }

  test("market share: per-year ratio matches an exact integer-cents tally") {
    val regionOfNation = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_regionkey")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    val nameOfNation = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name")
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    val asiaRegions = Tables.region(spark, sfDir)
      .filter(col("r_name") === "ASIA").select("r_regionkey")
      .collect().map(_.getInt(0)).toSet
    val asiaCust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
      .collect().filter(r => asiaRegions(regionOfNation(r.getInt(1))))
      .map(_.getLong(0)).toSet
    val promoParts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val suppNation = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .collect().map(r => (r.getLong(0), nameOfNation(r.getInt(1)))).toMap
    // year computed by Spark so session-TZ semantics match the engine's
    val orderOf = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("y"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap

    // revenue in exact 1e-4 currency units: price_cents * (100 − disc_cents),
    // summed in Long (no overflow at sf0.001)
    val tally = scala.collection.mutable.Map[Int, (Long, Long, Long)]()
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .collect().foreach { r =>
        val (ok, pk, sk) = (r.getLong(0), r.getLong(1), r.getLong(2))
        if (promoParts(pk) && orderOf.contains(ok) && asiaCust(orderOf(ok)._1)) {
          val year = orderOf(ok)._2
          val r4 = cents(r.getDouble(3)) * (100L - cents(r.getDouble(4)))
          val nat = if (suppNation(sk) == "NATION_9") r4 else 0L
          val (a, b, n) = tally.getOrElse(year, (0L, 0L, 0L))
          tally(year) = (a + nat, b + r4, n + 1)
        }
      }

    val got = DecisionQueries.dsqMarketShare(spark, sfDir).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getInt(0)).toSet == tally.keySet)
    got.foreach { r =>
      val (nat, tot, n) = tally(r.getInt(0))
      assert(r.getLong(3) == n, s"n_items year ${r.getInt(0)}")
      // the engine divides doubles obtained from the same exact decimal
      // sums, so the IEEE quotient of the integer tallies is bit-equal
      assert(r.getDouble(1) == (nat.toDouble / 10000.0) / (tot.toDouble / 10000.0),
        s"share year ${r.getInt(0)}")
      assert(math.abs(r.getDouble(2) - tot.toDouble / 10000.0) < 1e-6)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }

  test("small-qty revenue: qualification matches the literal below-half-average rule") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
    val perPart = li.groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.length.toLong)).toMap
    val brandOf = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap

    // qty < sum/(2n)  ⇔  2·qty·n < sum, all integers — no division
    val qualifying = li.filter { case (pk, q) =>
      val (sum, n) = perPart(pk); 2L * q * n < sum
    }
    val expectedN = qualifying.groupBy(t => brandOf(t._1)).view
      .mapValues(_.length.toLong).toMap

    val got = DecisionQueries.dsqSmallQtyRevenue(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(got.view.mapValues(_._2).toMap == expectedN)
    assert(got.values.forall(_._1 > 0.0))
  }

  test("waiting supplier: blame counts match the literal EXISTS/NOT-EXISTS scan") {
    // timestamps compared as epoch millis — TZ-independent, and
    // INTERVAL 60 DAYS on a UTC-session timestamp is exactly 60·86400 s
    val sixtyDaysMs = 60L * 86400 * 1000
    def ms(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[java.time.LocalDateTime](i)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val orderMs = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
      .collect().map(r => (r.getLong(0), ms(r, 1))).toMap
    val lines = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .collect().map(r => (r.getLong(0), r.getLong(1), ms(r, 2)))
    val suppsPerOrder = lines.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSet).toMap
    val lateSuppsPerOrder = lines
      .filter { case (ok, _, ship) =>
        orderMs.get(ok).exists(od => ship > od + sixtyDaysMs) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSet).toMap

    val blame = scala.collection.mutable.Map[Long, Long]()
    lines.foreach { case (ok, sk, ship) =>
      val isLate = orderMs.get(ok).exists(od => ship > od + sixtyDaysMs)
      // EXISTS other supplier on the order; NOT EXISTS other LATE supplier
      if (isLate && suppsPerOrder(ok).size > 1 &&
          lateSuppsPerOrder.get(ok).contains(Set(sk)))
        blame(sk) = blame.getOrElse(sk, 0L) + 1L
    }
    val nameOf = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = blame.toSeq.groupBy { case (sk, _) => nameOf(sk) }.view
      .mapValues(_.map(_._2).sum).toMap

    val got = DecisionQueries.dsqWaitingSupplier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  // shared exact revenue tally in 1e-4 currency units, per lineitem row
  private def revUnits(r: org.apache.spark.sql.Row): Long =
    cents(r.getDouble(1)) * (100L - cents(r.getDouble(2)))

  test("important nations: share qualification matches the integer tally at 2%") {
    val suppNationKey = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val nameOfNation = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name")
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    val perNation = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .collect().map(r => (suppNationKey(r.getLong(0)), revUnits(r)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = perNation.values.sum
    val expected = perNation.filter { case (_, rev) => rev * 50L > total }
      .map { case (nk, rev) => nameOfNation(nk) -> rev }

    val got = DecisionQueries.dsqImportantNations(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val rev = expected(r.getString(0))
      assert(r.getDouble(1) == (rev.toDouble / 10000.0) / (total.toDouble / 10000.0))
      assert(r.getDouble(1) > 0.02 * 0.999) // the cross-multiplied cut is the 2% rule
    }
  }

  test("top supplier: equals the exact-revenue argmax with all ties") {
    val perSupp = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .collect().map(r => (r.getLong(0), revUnits(r)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val maxRev = perSupp.values.max
    val expected = perSupp.filter(_._2 == maxRev).keySet

    val got = DecisionQueries.dsqTopSupplier(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet == expected)
    got.foreach(r => assert(math.abs(r.getDouble(2) - maxRev.toDouble / 10000.0) < 1e-6))
  }

  test("sales opportunity: above-average no-URGENT customers match the literal scan") {
    val custs = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .collect().map(r => (r.getLong(0), r.getString(1), cents(r.getDouble(2))))
    val pos = custs.map(_._3).filter(_ > 0)
    val (posSum, posN) = (pos.sum, pos.length.toLong)
    val urgentCusts = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .collect().map(_.getLong(0)).toSet
    val qualifying = custs.filter { case (ck, _, bal) =>
      bal * posN > posSum && !urgentCusts(ck) }
    assert(qualifying.nonEmpty, "fixture lost its no-URGENT qualifiers")
    val expected = qualifying.groupBy(_._2).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._3).sum)).toMap

    val got = DecisionQueries.dsqSalesOpportunity(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (seg, (n, bal)) =>
      val (en, ebal) = expected(seg)
      assert(n == en, s"segment $seg count")
      assert(math.abs(bal - ebal.toDouble / 100.0) < 1e-9, s"segment $seg balance")
    }
  }
}
