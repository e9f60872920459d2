package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Pins the round-14 ESD rewrite (per-type extremes array + expression
  * rounds — FrontierQueriesP.statEsdOutliers) against a FULL-GRID
  * brute-force recomputation of Rosner's sequential rounds, the shape
  * the DuckDB oracle states. The rewrite's correctness rests on one
  * lemma — each round's argmax |n·c − sc| over the eligible values is
  * attained at an eligible extreme, so after < 3 single-instance
  * removals the per-type top-3 ∪ bottom-3 values contain every
  * suspect — and this spec checks the CONCLUSION on real data: every
  * (type, round) suspect and G from the shipped query must equal the
  * values computed by scanning the entire value grid per round with no
  * extremes shortcut. Runs at sf0.001 and sf0.01 (both driver-graded).
  */
class EsdExtremesSpec extends SparkTestBase {

  private val Encode = 1048576L

  private def bruteForce(d: String): Seq[(String, Long, Double, Double)] = {
    // the same value grid the query builds
    val grid = ops.Tables.events(spark, d)
      .select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("c"))
      .groupBy("event_type", "c").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    grid.toSeq.sortBy(_._1).flatMap { case (tpe, rows) =>
      var vals = rows.map(r => (r._2, r._3)).toMap // c -> cnt
      var n = rows.map(_._3).sum
      var sc = rows.map(r => r._2 * r._3).sum
      var scc = rows.map(r => r._2 * r._2 * r._3).sum
      (1 to 3).map { k =>
        // full-grid argmax with the query's exact encode + tiebreak
        val mx = vals.collect { case (c, cnt) if cnt > 0 =>
          math.abs(n * c - sc) * Encode + c
        }.max
        val suspect = mx % Encode
        val maxdev = mx / Encode
        // the query's G tree: decimal varN through string to double
        val varN = (BigDecimal(n) * BigDecimal(scc) -
          BigDecimal(sc) * BigDecimal(sc)).toString.toDouble
        // Spark's round(double, 9) goes through BigDecimal.valueOf
        // (the Double.toString canonical form) — mirror it exactly
        val g = BigDecimal.valueOf((maxdev.toDouble / n.toDouble) /
          math.sqrt(varN / (n.toDouble * (n - 1).toDouble)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        val out = (tpe, k.toLong,
          BigDecimal.valueOf(suspect.toDouble / 100.0)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble, g)
        // downdate: one instance of the suspect leaves
        vals = vals.updated(suspect, vals(suspect) - 1)
        n -= 1; sc -= suspect; scc -= suspect * suspect
        out
      }
    }
  }

  private def check(d: String): Unit = {
    val got = SparkEntry.queries("stat_esd_outliers")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    ops.PipelineCache.releaseAll()
    val want = bruteForce(d)
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("esd extremes rewrite equals full-grid brute force at sf0.001") {
    check(sfDir)
  }

  test("esd extremes rewrite equals full-grid brute force at sf0.01") {
    check("/root/testdata/sf0.01")
  }
}
