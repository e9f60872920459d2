package graft

import org.apache.spark.sql.Row

/** Error-bound assertions for the two `no_oracle` sketch queries (r8
  * verdict #7): HLL++ and Greenwald–Khanna are not cross-engine
  * reproducible, so their correctness evidence is this spec pinning
  * their in-engine bound columns at every fixture scale on disk —
  * sf0.001, sf0.01, sf0.1, and the regenerated sf1 corpus when present
  * (`/tmp/sf1`, built by `graft.tools.ScaleUp`; skipped, not silently
  * passed, when absent). The HLL bound rides the QA form
  * (`approxDistinctHllQa`) — the benched registry query is sketch-only
  * (r9 verdict #3) so the bench measures the 100 TB path, not the
  * exact-distinct QA expand. */
class SketchBoundsSpec extends SparkTestBase {

  private val scales = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1", "/tmp/sf1")
      .filter(p => new java.io.File(p).isDirectory)

  test("HLL distinct estimate within 3·rsd of exact at every scale") {
    scales.foreach { sf =>
      val rows: Array[Row] =
        graft.ops.AggWindowQueries.approxDistinctHllQa(spark, sf).collect()
      assert(rows.nonEmpty, s"no groups at $sf")
      rows.foreach { r =>
        val flag = r.getString(0)
        assert(r.getAs[Boolean]("within_3rsd"),
          s"$sf group $flag: HLL estimate ${r.getAs[Long]("approx_parts")} " +
            s"vs exact ${r.getAs[Long]("exact_parts")} " +
            s"(rel_err ${r.getAs[Double]("rel_err")}) outside 3·rsd")
        // the bound column itself must have been computed from a sane
        // exact value — an exact of 0 would vacuously pass abs() <= 0
        assert(r.getAs[Long]("exact_parts") > 0, s"$sf group $flag: empty group")
      }
    }
  }

  test("GK percentile rank error within ε·n at every scale") {
    scales.foreach { sf =>
      val rows: Array[Row] =
        graft.ops.AggWindowQueries.approxQuantileSketch(spark, sf).collect()
      assert(rows.nonEmpty, s"no groups at $sf")
      rows.foreach { r =>
        val flag = r.getString(0)
        assert(r.getAs[Boolean]("p50_rank_ok"),
          s"$sf group $flag: p50 ${r.getAs[Double]("p50")} rank outside ε·n")
        assert(r.getAs[Boolean]("p99_rank_ok"),
          s"$sf group $flag: p99 ${r.getAs[Double]("p99")} rank outside ε·n")
        assert(r.getAs[Long]("n") > 0, s"$sf group $flag: empty group")
      }
    }
  }
}
