package graft

import org.apache.spark.sql.functions._

import graft.ops.{CurationQueries, JoinQueries, Tables}

/** Engine-side invariants for the Bloom-prefilter join, temperature
  * mixing, and quality quantile normalization — properties the DuckDB
  * hash-compare can't express (reduction ratios, monotonicity).
  */
class PrefilterMixSpec extends SparkTestBase {

  test("bloom prefilter join equals the plain join and the filter actually rejects rows") {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") >= 400000.0)
    // independent construction: plain DataFrame join, no bloom anywhere
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        .as("sum_price"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = JoinQueries.joinBloomPrefilter(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == plain.toSeq)
    assert(got.map(_._3).sum > 0, "fixture must produce matches")
    // the one-sided guarantee: the prefilter keeps every true match (the
    // equality above proves it) while rejecting the bulk of the probe
    // side — on this fixture the build side is a tiny fraction of the
    // keyspace, so a working 2-hash bloom must cut probe rows sharply
    val matched = li.join(o.select("o_orderkey"),
      li("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val total = li.count()
    assert(matched < total / 2, "fixture filter must be selective")
  }

  test("temperature mix up-samples small sources and down-samples large ones") {
    val rows = CurationQueries.curationTemperatureMix(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))) // source, avail, w, target, natural, boost
    assert(rows.length > 1)
    rows.foreach { case (src, avail, w, _, _, _) =>
      assert(w == math.sqrt(avail.toDouble * 1e6).floor.toLong, src)
    }
    // α = 1/2 ⇒ boost factor is anti-monotone in source size (ties allowed)
    val bySize = rows.sortBy(_._2)
    bySize.sliding(2).foreach { case Array(a, b) =>
      if (a._2 < b._2) assert(a._6 >= b._6,
        s"smaller ${a._1} boost ${a._6} < larger ${b._1} boost ${b._6}")
    }
    // targets respect the global budget (floor rounding only loses tokens)
    val totalTok = rows.map(_._2).sum
    assert(rows.map(_._4).sum <= totalTok / 2)
    // at least one genuine up- and one down-sample on a non-uniform corpus
    assert(rows.exists(_._6 > 1000) && rows.exists(_._6 < 1000))
  }

  test("quality quantile normalization is balanced and monotone within source") {
    val rows = CurationQueries.curationQualityQnorm(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 9))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._3).sum == nDocs)
    // within each source, the mean raw score must rise with the decile —
    // the property that makes a global normalized threshold fair
    rows.groupBy(_._1).values.foreach { g =>
      val means = g.sortBy(_._2).map(r => r._4.toDouble / r._3).toSeq
      means.zip(means.drop(1)).foreach { case (a, b) =>
        assert(a <= b + 1e-9)
      }
    }
  }
}
