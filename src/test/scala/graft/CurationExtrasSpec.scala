package graft

import org.apache.spark.sql.functions._
import graft.ops.{SimilarityQueries, Tables, TextQueries}
import graft.similarity.Vectors

class CurationExtrasSpec extends SparkTestBase {

  test("semantic-cell dedup finds no false positives vs brute force") {
    val got = SimilarityQueries.dedupSemanticCells(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty, "fixture produced no semantic near-dup pair")
    got.foreach { case (_, _, cos) => assert(cos >= SimilarityQueries.SemTau) }
    // every reported pair must also clear τ under an independent
    // brute-force cosine (no false positives; recall < 1 is expected)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        Vectors.normSq(col("embedding")).as("nsq"))
    val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (Vectors.dot(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nsq") * col("b.nsq"))).as("cos"))
      .filter(col("cos") >= SimilarityQueries.SemTau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (a, b, _) =>
      assert(brute.contains((a, b)), s"pair ($a,$b) not in brute-force set")
    }
  }

  test("quality calibration deciles are contiguous, balanced, and ordered") {
    val rows = TextQueries.textQualityCalibrate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, ds) =>
      val sorted = ds.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"$lang: deciles not contiguous from 1")
      // ntile balance: bucket sizes differ by at most 1
      val ns = sorted.map(_._3)
      assert(ns.max - ns.min <= 1, s"$lang: unbalanced deciles $ns")
      // score bands must be non-decreasing across deciles
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo._5 <= hi._4 + 1e-12,
            s"$lang: decile ${lo._2} hi ${lo._5} > decile ${hi._2} lo ${hi._4}")
        case _ =>
      }
    }
  }

  test("html strip recovers the original text plus the decoded footer") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextQueries.textHtmlStrip(spark, sfDir).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val (id, rawLen, cleaned, nStripped) =
        (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3))
      val text = docs(id)
      if (!text.exists(c => c == '<' || c == '&')) {
        val expected = (text.trim.replaceAll("\\s+", " ") + " &sect;").trim
        assert(cleaned == expected, s"doc $id: got '$cleaned'")
      }
      assert(rawLen > text.length && nStripped > 0)
    }
  }
}
