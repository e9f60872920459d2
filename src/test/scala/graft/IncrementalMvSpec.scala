package graft

import org.apache.spark.sql.functions._
import graft.ops.{StatQueries, Tables}

/** Driver-side re-derivations for the incremental-MV merge and last-touch
  * attribution: brute-force simulations over collected rows (sf0.001 is
  * small) — independent of the engine's window/merge plans.
  */
class IncrementalMvSpec extends SparkTestBase {

  private def cents(d: Double): Long =
    new java.math.BigDecimal(d).setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  // (event_id, user, type, value_cents, epoch_sec, day)
  private lazy val events: Array[(Long, Long, String, Long, Long, String)] = {
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"),
        to_date(col("ts")).cast("string").as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        cents(r.getDouble(3)), r.getLong(4), r.getString(5)))
  }

  test("incremental MV merge equals a row-level recompute, and both halves are non-trivial") {
    // the split must genuinely exercise the merge: both sides non-empty
    assert(events.exists(_._6 < "2024-01-25") && events.exists(_._6 >= "2024-01-25"))

    val expected = events.groupBy(_._3).view.mapValues { xs =>
      (xs.length.toLong, xs.map(_._4).sum, xs.map(_._4).min, xs.map(_._4).max,
        xs.map(_._6).distinct.length.toLong)
    }.toMap

    val got = StatQueries.etlIncrementalMv(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (n, sum, mn, mx, days) = expected(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - sum.toDouble / 100.0) < 1e-9)
      assert(r.getDouble(3) == mn.toDouble / 100.0)
      assert(r.getDouble(4) == mx.toDouble / 100.0)
      assert(r.getLong(5) == days)
    }
  }

  test("last-touch attribution matches a per-user replay") {
    val lookback = 7L * 86400
    val tally = scala.collection.mutable.Map[String, (Long, Long)]()
    events.groupBy(_._2).values.foreach { userEvents =>
      var lastTouch: Option[(Long, String)] = None // (sec, type)
      userEvents.sortBy(e => (e._5, e._1)).foreach { case (_, _, et, v, sec, _) =>
        if (et == "purchase") {
          val credit = lastTouch match {
            case Some((tsec, ttype)) if tsec >= sec - lookback => ttype
            case _ => "none"
          }
          val (n, s) = tally.getOrElse(credit, (0L, 0L))
          tally(credit) = (n + 1, s + v)
        }
        if (et == "click" || et == "view") lastTouch = Some((sec, et))
      }
    }

    val got = StatQueries.windowAttributionLasttouch(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == tally.keySet)
    tally.foreach { case (t, (n, s)) =>
      assert(got(t)._1 == n, s"touch $t count")
      assert(math.abs(got(t)._2 - s.toDouble / 100.0) < 1e-9, s"touch $t value")
    }
    // conservation: every purchase is attributed exactly once
    assert(got.values.map(_._1).sum == events.count(_._3 == "purchase").toLong)
  }
}
