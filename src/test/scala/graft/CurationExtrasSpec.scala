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

  test("sequence packing agrees with a scalar replay of the running sum") {
    import graft.ops.CurationQueries
    val B = CurationQueries.PackBudget
    // replay: same deterministic order (md5 key, doc_id), same budget,
    // folded in plain Scala per source
    val base = Tables.documents(spark, sfDir)
      .select(col("source"),
        md5(concat(lit("pack:"), col("doc_id").cast("string"))).as("key"),
        col("doc_id"),
        graft.text.TextAnalysis.approxBpeCount(col("text")).as("tok"))
      .filter(col("tok") > 0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = base.groupBy(_._1).map { case (src, rows) =>
      val toks = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val cums = toks.scanLeft(0L)(_ + _).tail
      val crossings = toks.zip(cums).map { case (tok, cum) =>
        (cum - 1) / B - (cum - tok) / B }
      src -> (rows.length.toLong, toks.sum, (toks.sum - 1) / B + 1,
        crossings.count(_ > 0).toLong, crossings.sum)
    }
    val prod = CurationQueries.curationPackSequences(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(prod.nonEmpty && prod == expected)
    // split docs are impossible unless a source exceeds one sequence
    prod.values.foreach { case (nDocs, tot, nSeqs, nSplit, nCross) =>
      assert(nSeqs == (tot - 1) / B + 1)
      assert(nSplit <= nSeqs - 1, "at most one straddler per boundary")
      assert(nCross >= nSplit)
      assert(nDocs > 0 && tot > 0)
    }
  }

  test("length buckets: power-of-two caps, conservation, fill > 1/2") {
    import graft.ops.CurationQueries
    val rows = CurationQueries.curationLengthBuckets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (cap, nDocs, sumTok, padding, fill) =>
      assert((cap & (cap - 1)) == 0 && cap > 0, s"cap $cap not a power of two")
      // every member n satisfies cap/2 < n <= cap, so the aggregates obey:
      assert(padding >= 0 && padding < nDocs * cap / 2, s"cap $cap padding")
      assert(sumTok + padding == nDocs * cap, s"cap $cap conservation")
      assert(fill > 0.5 && fill <= 1.0, s"cap $cap fill $fill")
      assert(fill == sumTok.toDouble / (nDocs * cap), s"cap $cap fill formula")
    }
    // bucketed docs = docs with at least one token
    val nTokenful = Tables.documents(spark, sfDir)
      .filter(graft.text.TextAnalysis.tokenCount(col("text")) > 0).count()
    assert(rows.map(_._2).sum == nTokenful)
  }

  test("incremental batch verdicts partition the arrival slice") {
    import graft.ops.{DedupQueries, PipelineCache}
    val rows = DedupQueries.dedupIncrementalBatch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSet.subsetOf(Set("exact_dup", "near_dup", "novel")))
    // the verdicts must partition EXACTLY the hash-derived new slice
    val nNew = Tables.documents(spark, sfDir)
      .filter(pmod(graft.dedup.Dedup.hexFold32(
        md5(concat(lit("inc:"), col("doc_id").cast("string")))), lit(100L)) >= 90)
      .count()
    assert(rows.map(_._2).sum == nNew, s"verdict counts must sum to $nNew")
    // the corpus has no exact duplicates, so that class must be absent
    assert(!rows.exists(_._1 == "exact_dup"))
    // the containment gate must actually split the batch on this corpus
    assert(rows.exists(_._1 == "near_dup") && rows.exists(_._1 == "novel"))
    PipelineCache.releaseAll()
  }

  test("shingle novelty: unique shingles are counted once, bounds hold") {
    import graft.ops.{DedupQueries, PipelineCache}
    val rows = DedupQueries.textShingleNovelty(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nSh, nUniq, frac) =>
      assert(nSh > 0 && nUniq >= 0 && nUniq <= nSh, s"doc $id bounds")
      assert(frac == nUniq.toDouble / nSh, s"doc $id fraction")
    }
    // a df=1 shingle belongs to exactly one doc, so Σ n_unique must equal
    // the corpus-wide count of singleton shingles (independent recompute)
    val singletons = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokens(col("text")).as("tok"))
      .select(col("doc_id"), graft.dedup.Dedup.shingleHashes(
        graft.dedup.Dedup.tokenHashes(col("tok"))).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(explode(col("sh")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") === 1).count()
    assert(rows.map(_._3).sum == singletons)
    PipelineCache.releaseAll()
  }

  test("retention cohort: day-0 row equals the cohort size and bounds every offset") {
    val rows = graft.ops.AggWindowQueries.windowRetentionCohort(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val day0 = rs.find(_._2 == 0)
      assert(day0.isDefined, s"cohort $c must have an offset-0 row")
      // every user is active on their first day, so offset 0 carries the
      // full cohort and no later offset can exceed it
      assert(rs.forall(_._3 <= day0.get._3), s"cohort $c monotone bound")
      assert(rs.forall(_._2 >= 0), s"cohort $c offsets non-negative")
    }
    // cohort sizes must partition the user population
    val nUsers = graft.ops.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0).get._3).sum == nUsers)
  }

  test("rolling distinct equals a naive per-day window recount") {
    import graft.ops.AggWindowQueries
    val act = graft.ops.Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")), to_date(lit("2024-01-01"))).as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    val prod = AggWindowQueries.windowRollingDistinct(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(prod.nonEmpty)
    // naive recount: for each report day, distinct users with an active
    // day inside [rday-6, rday]
    prod.foreach { case (rday, n) =>
      val expect = act.filter { case (_, d) => d >= rday - 6 && d <= rday }
        .map(_._1).distinct.length
      assert(n == expect, s"rday $rday")
    }
    // every day in the contribution range must be present
    val days = act.map(_._2)
    assert(prod.keySet == (days.min to days.max + 6).toSet)
  }

  test("batch knn ranks are cell-consistent and ordered") {
    import graft.ops.{PipelineCache, SimilarityQueries}
    val rows = SimilarityQueries.simKnnBatchIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to byRank.length), s"q $q ranks")
      assert(byRank.length <= 3, s"q $q at most 3")
      // scores non-increasing with rank; self never its own neighbor
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true }, s"q $q order")
      assert(rs.forall(_._3 != q), s"q $q self-match")
    }
    // every vector with at least one cell-mate must appear as a query
    val nQ = rows.map(_._1).distinct.length
    assert(nQ > 100, s"expected most vectors ranked, got $nQ")
    PipelineCache.releaseAll()
  }

  test("near-dup prune drops exactly the non-representative cluster members") {
    import graft.ops.{DedupQueries, PipelineCache}
    val labels = DedupQueries.dedupClusterConverged(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val losers = labels.count { case (id, cl) => id != cl }
    val perSource = DedupQueries.dedupNeardupPrune(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.documents(spark, sfDir).count()
    assert(perSource.map(_._2).sum == total)
    assert(perSource.map(r => r._2 - r._3).sum == losers,
      "pruned total must equal the loser count")
    perSource.foreach { case (src, nDocs, nKept, keptTok) =>
      assert(nKept <= nDocs && nKept > 0, src)
      assert(keptTok > nKept, s"$src: bpe tokens must exceed doc count")
    }
    PipelineCache.releaseAll()
  }

  test("epoch mix: integer replay, budget conservation, cap semantics") {
    val rows = SparkEntry.queries("curation_epoch_mix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    val sumAvail = rows.map(_._3).sum
    val budget = sumAvail / 2
    val sumW = rows.map(_._4).sum
    rows.foreach { case (src, _, avail, w, target, epochs, shipped, under) =>
      assert(target == budget * w / sumW, s"$src target")
      assert(epochs == math.min((target + avail - 1) / avail, 4L), s"$src epochs")
      assert(shipped == math.min(target, avail * 4), s"$src shipped")
      assert(under == (avail * 4 < target), s"$src undersupplied flag")
      assert(epochs >= 1 && epochs <= 4, s"$src epoch range")
    }
    // floor-div targets never overshoot the budget in aggregate
    assert(rows.map(_._5).sum <= budget)
  }

  test("domain quota keeps exactly the top-quality docs of each source") {
    val got = SparkEntry.queries("curation_domain_quota")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // scalar replay: per source, sort by (min(chars,2000) desc, doc_id),
    // keep 40, and the kept-chars sum must pin the SAME winners
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = docs.groupBy(_._2)
    got.foreach { case (src, nDocs, nKept, keptChars) =>
      val all = bySource(src)
      assert(nDocs == all.length, src)
      val kept = all.sortBy { case (id, _, ch) => (-math.min(ch, 2000L), id) }
        .take(40)
      assert(nKept == kept.length, src)
      assert(keptChars == kept.map(_._3).sum,
        s"$src: quota admitted different docs than the quality order")
    }
  }

  test("reservoir sample: exact per-group size and the true hash-order prefix") {
    import org.apache.spark.sql.functions.col
    val out = graft.ops.CurationQueries.sampleReservoirGroup(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        graft.dedup.Dedup.hexFold32(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("reservoir:"),
            col("doc_id").cast("string")))).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val want = ds.sortBy(d => (d._3, d._2)).take(5).map(_._2).toSeq
      val got = out.filter(_._1 == src).sortBy(_._2).map(_._3).toSeq
      assert(got == want, s"$src sample")
    }
  }

  test("sentence stats match a scala re-segmentation of every document") {
    import org.apache.spark.sql.functions.col
    val out = graft.ops.TextQueries.textSentenceStats(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getInt(4)))).toMap
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    docs.foreach { case (id, text) =>
      val sents = text.split("[.!?]+").map(_.trim).filter(_.nonEmpty)
      if (sents.isEmpty) assert(!out.contains(id))
      else {
        val lens = sents.map(s => s.split("\\s+").count(_.nonEmpty))
        val (n, tot, avg, mx) = out(id)
        assert(n == sents.length && tot == lens.sum && mx == lens.max,
          s"doc $id counts")
        assert(avg == lens.sum.toDouble / sents.length, s"doc $id avg")
      }
    }
  }

  test("overlapping chunks tile every document: grid starts, full coverage, " +
      "exact reconstruction") {
    import org.apache.spark.sql.functions._
    val chunks = graft.ops.CurationQueries.curationChunkOverlap(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      .filter(_._2.nonEmpty)
    assert(chunks.map(_._1).toSet == docs.keySet)
    chunks.groupBy(_._1).foreach { case (docId, cs) =>
      val tok = docs(docId)
      val sorted = cs.sortBy(_._2)
      // starts are exactly the stride grid covering every token
      assert(sorted.map(_._3).toSeq == (0L until tok.length by 12).toSeq)
      sorted.foreach { case (_, _, start, nTok, text) =>
        val want = tok.slice(start.toInt, start.toInt + 16)
        assert(nTok == want.length, s"doc $docId start $start size")
        assert(text == want.mkString(" "), s"doc $docId start $start text")
      }
      // consecutive chunks overlap by 4 tokens (except a short tail)
      assert(sorted.last._3 < tok.length)
    }
  }
}
