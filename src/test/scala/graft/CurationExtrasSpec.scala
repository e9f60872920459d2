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

  test("PCA power-iteration matvec matches a plain-double reference within 2^-32·n") {
    val got = SimilarityQueries.simPcaPowerIter(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 64)
    val v0 = Seq.tabulate(64)(j => ((j % 5) - 2).toDouble)
    val vecs = Tables.embeddings(spark, sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    val ref = Array.fill(64)(0.0)
    vecs.foreach { x =>
      val s = x.indices.map(i => x(i) * v0(i)).sum
      x.indices.foreach(i => ref(i) += x(i) * s)
    }
    got.foreach { case (dim, n, w) =>
      assert(n == vecs.length)
      // fixed-point floor loses < 2^-32 per row; reference is plain
      // double so allow the quantization plus fp-reassociation slack
      assert(math.abs(w - ref(dim.toInt - 1)) < n * math.pow(2, -32) + 1e-6,
        s"dim $dim: $w vs ${ref(dim.toInt - 1)}")
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

  test("z-order buckets bound both coordinate ranges (the skipping property)") {
    val rows = graft.ops.ScalarQueries.scalarZorderPack(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (zLo, zHi) = (r.getLong(2), r.getLong(3))
      val (xLo, xHi, yLo, yHi) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(zLo <= zHi && (zLo >> 20) == (zHi >> 20))
      // a 2^20 zkey range interleaves ≤10 low bits per axis → each
      // bucket's rectangle spans at most 2^10 in x and in y
      assert(xHi - xLo < 1024, s"x range ${xHi - xLo} not bounded")
      assert(yHi - yLo < 1024, s"y range ${yHi - yLo} not bounded")
    }
    // interleave must be invertible: de-interleaving z_lo's even/odd
    // bits reproduces coordinates inside the bucket's rectangle
    def unspread(z: Long): Long = {
      var v = z & 0x55555555L
      v = (v | (v >> 1)) & 0x33333333L
      v = (v | (v >> 2)) & 0x0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FFL
      (v | (v >> 8)) & 0xFFFFL
    }
    rows.foreach { r =>
      val z = r.getLong(2)
      val (x, y) = (unspread(z), unspread(z >> 1))
      assert(x >= r.getLong(4) && x <= r.getLong(5))
      assert(y >= r.getLong(6) && y <= r.getLong(7))
    }
  }

  test("curation v2 pipeline composes its stages consistently") {
    val out = graft.ops.CurationQueries.pipelineCurationV2(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
    assert(out.nonEmpty)
    out.foreach { case (_, (n, toks)) => assert(n > 0 && toks > n) }
    val total = Tables.documents(spark, sfDir).count()
    val kept = out.map(_._2._1).sum
    assert(kept < total, "pipeline must drop something")
    // the decile gate alone caps retention at ~80% per language (+1 for
    // ntile remainder rounding); passage dedup only removes more
    assert(kept <= total * 0.8 + 20, s"kept $kept of $total")
    // losers from the passage stage must not be counted anywhere
    val losers = graft.ops.DedupQueries.dedupSharedPassage(spark, sfDir)
      .select("b_id").distinct().count()
    assert(kept + losers <= total + 20)
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
