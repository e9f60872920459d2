package graft

import org.apache.spark.sql.functions._

import graft.ops.{CurationQueries, DedupQueries, Tables}

/** Semantic invariants for the curation pack (the oracle gate proves
  * value equality; these pin the properties that make the operators
  * correct as PIPELINE stages). */
class CurationSpec extends SparkTestBase {

  test("pii redaction is complete: no pattern survives in the redacted text") {
    // rebuild the redacted text the query hashes, then re-scan it
    val red = Tables.documents(spark, sfDir).select(
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        "[0-9]{3}\\.[0-9]{3}\\.[0-9]{3}-[0-9]{2}", "<ID>"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "[0-9]{4,}", "<NUM>").as("red"))
    val leftover = red.filter(
      col("red").rlike("[0-9]{4,}") ||
        col("red").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
      .count()
    assert(leftover == 0)
  }

  test("stratified sample keeps within stratum bounds at the declared rate") {
    val rows = CurationQueries.sampleStratifiedLang(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rate, n, kept) =
        (r.getAs[Long]("keep_rate"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(rate >= 50 && rate <= 99, s"rate $rate out of band")
      assert(kept <= n, s"kept $kept > total $n")
    }
  }

  test("weighted mix spends exactly the budget and respects weight bands") {
    val total = Tables.documents(spark, sfDir).count()
    val rows = CurationQueries.mixWeightedSources(spark, sfDir).collect()
    val taken = rows.map(_.getAs[Long]("n_taken")).sum
    assert(taken == math.min(200L, total), s"taken $taken of $total")
    rows.foreach { r =>
      val w = r.getAs[Long]("w")
      assert(w >= 1 && w <= 3, s"weight $w out of band")
    }
  }

  test("contamination flags only train-split docs, each sharing >= 1 shingle") {
    val flagged = DedupQueries.dedupContaminationNgram(spark, sfDir)
    val split = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("split:"), col("doc_id").cast("string")))), lit(100L))
    val holdoutFlagged = flagged.filter(split >= 90).count()
    assert(holdoutFlagged == 0, "a holdout doc was flagged as contaminated train doc")
    assert(flagged.filter(col("n_shared") < 1).count() == 0)
    assert(flagged.count() > 0) // the synthetic corpus shares vocabulary
  }
}
