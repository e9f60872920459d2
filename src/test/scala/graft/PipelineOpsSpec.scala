package graft

import org.apache.spark.sql.functions._
import graft.ops.{AggWindowQueries, CurationQueries, Tables, TextQueries}

/** Round-6 pipeline operators: chunk-level dedup, bigram-LM scoring,
  * DSIR importance weights, daily-series autocorrelation. */
class PipelineOpsSpec extends SparkTestBase {

  test("chunk dedup: exact-duplicate docs have every chunk flagged as dup") {
    val rows = TextQueries.textChunkDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, dup, kept) =>
      assert(dup >= 0 && dup <= n, s"doc $id: dup $dup outside [0,$n]")
      assert(kept == (n - dup) * 10, s"doc $id: kept_tokens mismatch")
    }
    // differential: recompute per-doc dup-chunk counts from scratch on the
    // driver (collect the tiny fixture, cut chunks, count globally)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def chunksOf(text: String): Seq[String] = {
      val tok = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (0 until tok.length / 10).map(i => tok.slice(i * 10, i * 10 + 10).mkString(" "))
    }
    val all = docs.flatMap { case (id, t) => chunksOf(t).map(c => (id, c)) }
    val occ = all.groupBy(_._2).map { case (c, xs) => c -> xs.length }
    val refDup = all.groupBy(_._1).map { case (id, xs) =>
      id -> xs.count(x => occ(x._2) > 1).toLong
    }
    assert(refDup.values.sum > 0, "fixture produced no duplicated chunk at all")
    rows.foreach { case (id, _, dup, _) =>
      assert(dup == refDup.getOrElse(id, -1L),
        s"doc $id: engine dup $dup vs reference ${refDup.get(id)}")
    }
  }

  test("bigram LM score: probabilities bounded and match a driver reference") {
    val rows = TextQueries.textLmBigramScore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nb, p) =>
      assert(nb >= 1, s"doc $id: no bigrams")
      assert(p > 0.0 && p <= 1.0, s"doc $id: avg transition p $p outside (0,1]")
    }
    // differential: recompute the smoothed mean transition probability on
    // the driver from the collected fixture
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
    val vocab = docs.flatMap(_._2).distinct.length
    val bigrams = docs.flatMap { case (_, t) => t.zip(t.drop(1)) }
    val cb = bigrams.groupBy(identity).map { case (k, v) => k -> v.length }
    val cl = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length }
    val ref = docs.filter(_._2.length >= 2).map { case (id, t) =>
      val terms = t.zip(t.drop(1)).map(b =>
        (cb(b) + 1).toDouble / (cl(b._1) + vocab).toDouble)
      id -> terms.sum / terms.length
    }.toMap
    rows.foreach { case (id, _, p) =>
      val r = ref(id)
      assert(math.abs(p - r) < 1e-12, s"doc $id: engine $p vs reference $r")
    }
  }

  test("DSIR weights: target slice skews above 1, others below") {
    val rows = CurationQueries.curationDsirWeights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.length > 0)
    rows.foreach { case (id, _, n, w, sel) =>
      assert(n >= 1)
      assert(w > 0.0, s"doc $id: non-positive weight $w")
      assert(sel == (w > 1.0), s"doc $id: selected flag inconsistent")
    }
    val (tgt, rest) = rows.partition(_._2 == "src0")
    assert(tgt.nonEmpty && rest.nonEmpty)
    val meanT = tgt.map(_._4).sum / tgt.length
    val meanR = rest.map(_._4).sum / rest.length
    assert(meanT > meanR,
      s"target docs do not skew toward target distribution: $meanT <= $meanR")
  }

  test("autocorr: one row per lag, |r| bounded, pair counts shrink with lag") {
    val rows = AggWindowQueries.timeAutocorr(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    rows.foreach { case (k, m, r) =>
      assert(m >= 2, s"lag $k: too few pairs")
      assert(math.abs(r) <= 1.0 + 1e-12, s"lag $k: |autocorr| $r > 1")
    }
    val ms = rows.sortBy(_._1).map(_._2)
    assert(ms.zip(ms.tail).forall { case (a, b) => b <= a },
      "pair counts must weakly decrease with lag")
  }
}
