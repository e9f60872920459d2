package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis._

/** Declared text-analysis queries over the `documents` table (SURVEY
  * §2.2 extension block). Every heuristic is mirrored exactly in the
  * DuckDB oracle (list_filter/list_transform/list_reduce); divisions are
  * double-by-double with identical operands so IEEE results match
  * bit-for-bit.
  */
object TextQueries {

  private[ops] val stopwords = Seq("the", "a")
  private[ops] val sqlWords  = Seq("join", "filter", "query", "sort", "merge", "agg")
  private[ops] val dataWords = Seq("data", "table", "row", "column", "batch", "stream")

  /** Token frequency top-50 (count desc, token asc tiebreak). The explode
    * fans out ~100 tokens/doc, then partial aggregation collapses before
    * the single shuffle on token. */
  def textTokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  /** Quality scoring: token count, stopword hits, ratio, quality flag. */
  def textQualityScore(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        markerCount(col("text"), stopwords).as("n_stop"),
        stopwordRatio(col("text"), stopwords).as("stop_ratio"),
        isQuality(col("text"), stopwords).as("is_quality"))
      .orderBy("doc_id")

  /** Marker-argmax language ID (n-gram-style scoring shape). */
  def textLangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        markerCount(col("text"), stopwords).as("n_art"),
        markerCount(col("text"), sqlWords).as("n_sql"),
        markerCount(col("text"), dataWords).as("n_data"),
        langId(col("text"), Seq(
          "generic" -> stopwords, "sqlish" -> sqlWords, "dataish" -> dataWords))
          .as("pred_lang"))
      .orderBy("doc_id")

  /** LANGUAGE-ID CONFUSION MATRIX — the classifier-eval rollup run
    * after [[textLangId]]: counts per (labeled lang, predicted lang)
    * plus the share of the label's row (one double division of two
    * exact counts). The matrix is what decides whether a heuristic
    * classifier is fit to gate a corpus — precision/recall per class
    * are row/column reads off it.
    *
    * Scale posture: prediction is the same codegen'd projection as
    * [[textLangId]]; the matrix partial-aggregates to |langs|² rows and
    * the per-label totals ride a tiny window over that frame. */
  def textLangidConfusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val w = Window.partitionBy("lang")
    Tables.documents(s, d)
      .select(col("lang"), langId(col("text"), Seq(
        "generic" -> stopwords, "sqlish" -> sqlWords, "dataish" -> dataWords))
        .as("pred_lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .withColumn("label_total", sum(col("n")).over(w))
      .select(col("lang"), col("pred_lang"), col("n"),
        (col("n").cast(DoubleType) / col("label_total").cast(DoubleType))
          .as("share_of_label"))
      .orderBy("lang", "pred_lang")
  }

  /** Document fingerprints: exact (md5) + order-sensitive rolling hash. */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        contentFingerprint(col("text")).as("fp_md5"),
        rollingFingerprint(col("text")).as("fp_roll"))
      .orderBy("doc_id")

  /** Approx BPE-ish token budget per source. */
  def textBpeBudget(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("source")
      .agg(sum(approxBpeCount(col("text"))).as("bpe_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  /** Bigram frequency top-30 (n-gram analysis shape). Built with
    * zip_with over two shifted slices: the slices are zip_with
    * ARGUMENTS, evaluated once per row — indexing the token array
    * inside a per-element lambda would re-evaluate the tokenizer per
    * position once CollapseProject inlines it (the trap documented in
    * Dedup.shingleHashes). */
  def textBigramFreq(s: SparkSession, d: String): DataFrame = {
    val tok = col("tok")
    val n = size(tok)
    val bigrams = when(n >= 2,
      zip_with(slice(tok, lit(1), n - 1), slice(tok, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    Tables.documents(s, d)
      .select(tokens(col("text")).as("tok"))
      .select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(30)
  }

  /** The shared curation gate: exact-dedup survivor (first doc per
    * content hash) → quality gate → language gate. ONE implementation
    * composed by both [[textCurationFunnel]] and
    * [[CurationQueries.pipelinePretrainCorpus]] — the thresholds live
    * here only (the matching oracle fragments are
    * [[survivorFromSql]]/[[qualityGateSql]]/[[langCaseSql]]). */
  private[ops] def curationGate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val survivorRank = row_number().over(
      Window.partitionBy(md5(col("text"))).orderBy("doc_id"))
    df.withColumn("rk", survivorRank)
      .filter(col("rk") === 1)
      .filter(isQuality(col("text"), stopwords) &&
        langId(col("text"), Seq(
          "generic" -> stopwords, "sqlish" -> sqlWords, "dataish" -> dataWords))
          =!= "sqlish")
  }

  /** Composite curation funnel — the three text gates a training-data
    * pipeline chains before tokenization, in one plan: [[curationGate]]
    * → per-source document/token budget. Single pass over the
    * corpus: the window dedup is one shuffle on the content hash, the
    * gates are codegen'd scalar filters on top, and the final rollup is
    * a partial-aggregated groupBy — at 100 TB this is one shuffle more
    * than the budget query alone. */
  def textCurationFunnel(s: SparkSession, d: String): DataFrame =
    curationGate(Tables.documents(s, d))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(approxBpeCount(col("text"))).as("bpe_tokens"))
      .orderBy("source")

  /** Deterministic hash-based train/holdout split — the reproducible
    * sampling primitive every training-data pipeline needs: membership
    * is a pure function of (salt, doc_id) via md5, so the same doc
    * lands in the same split on every run, on any cluster, at any
    * parallelism — no RNG, no sampleBy seed drift across Spark
    * versions. 90/10 by hash bucket; embarrassingly parallel (one
    * codegen'd projection, the only shuffle is the summary rollup). */
  def sampleHashSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("split:"), col("doc_id").cast("string")))), lit(100L))
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(bucket < 90, "train").otherwise("holdout").as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("split")
  }

  /** Gopher-style intra-document repetition signals — the quality gate
    * that catches boilerplate/spam the stopword heuristics miss: type-
    * token ratio and the most-frequent-token fraction, flagged when
    * either crosses the classic thresholds (top token > 20% of the doc,
    * or fewer than 30% distinct tokens).
    *
    * Scale posture: explode → two-level aggregation; the (doc_id, token)
    * level partial-aggregates map-side, so the only shuffle carries one
    * row per distinct token per doc — the same shape as tf computation.
    * Token-less docs drop out of the explode on BOTH engines (the oracle
    * unnests the same token list), so the outputs stay aligned. */
  def textRepetitionScore(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_tokens"), count(lit(1)).as("n_types"),
        max("n").as("max_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("max_cnt"),
        (col("n_types").cast(DoubleType) / col("n_tokens").cast(DoubleType)).as("ttr"),
        (col("max_cnt").cast(DoubleType) / col("n_tokens").cast(DoubleType)).as("top_frac"))
      .withColumn("is_repetitive", col("top_frac") > 0.2 || col("ttr") < 0.3)
      .orderBy("doc_id")
  }

  /** Corpus document frequency (inverted-index statistics): for the 40
    * most widespread tokens, in how many DOCS each appears and the doc
    * fraction. df_frac is the division only — no log-IDF, because libm
    * `ln` is not guaranteed bit-identical across engines and the hash
    * gate needs exact doubles; a consumer applies its own log.
    *
    * Scale posture: array_distinct BEFORE the explode keeps the shuffle
    * to one row per distinct (doc, token); the corpus-size scalar rides
    * in as a broadcast single row (no second pass over the data in the
    * same plan — Spark computes it in a 1-row subplan). */
  def textDocFrequency(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val docs = Tables.documents(s, d)
    val total = docs.agg(count(lit(1)).cast(DoubleType).as("total"))
    docs.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(total))
      .select(col("token"), col("df"),
        (col("df").cast(DoubleType) / col("total")).as("df_frac"))
      .orderBy(col("df").desc, col("token"))
      .limit(40)
  }

  /** Per-language quality-score CALIBRATION — the step that turns a raw
    * quality score into a keep/drop threshold that is FAIR across
    * languages (a fixed global cutoff over-prunes whichever language
    * the scorer is biased against): ntile(10) deciles of the stopword
    * ratio within each language, rolled up to (lang, decile) bands with
    * their score ranges. Docs with no tokens (NULL ratio) are excluded
    * BEFORE ranking — also sidesteps the Spark-NULLS-FIRST vs
    * DuckDB-NULLS-LAST sort divergence.
    *
    * Scale posture: the window partitions by lang — a within-partition
    * sort after ONE hash exchange that the rollup then reuses (subset
    * rule); nothing is globally sorted. ntile is deterministic given
    * the (score, doc_id) total order. */
  def textQualityCalibrate(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("score"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        stopwordRatio(col("text"), stopwords).as("score"))
      .filter(col("score").isNotNull)
      .select(col("lang"), col("score"), ntile(10).over(w).as("decile"))
      .groupBy("lang", "decile")
      .agg(count(lit(1)).as("n"), min(col("score")).as("lo"),
        max(col("score")).as("hi"))
      .orderBy("lang", "decile")
  }

  /** HTML/markup STRIP — the boilerplate-removal front gate of a crawl
    * pipeline: drop tags, decode the common entities, collapse the
    * whitespace runs the removals leave behind. The corpus text is
    * plain, so the markup is SYNTHESIZED deterministically around it
    * (per-doc tag id, entity-escaped ampersand footer) — the transform
    * under test is the strip, which must recover exactly the original
    * text plus the decoded footer. Pure per-row projection: zero
    * shuffle at any corpus size, codegen'd regexp over each row.
    *
    * Both engines apply the same Java-compatible regex subset
    * (`<[^>]*>` has identical semantics in java.util.regex and RE2);
    * DuckDB needs the explicit 'g' flag to match Spark's replace-all. */
  def textHtmlStrip(s: SparkSession, d: String): DataFrame = {
    val html = htmlCol
    val cleaned = cleanedCol
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(html).as("raw_len"),
        cleaned.as("cleaned"),
        (length(html) - length(cleaned)).as("n_stripped"))
      .orderBy("doc_id")
  }

  /** The synthesized-markup wrap (see [[textHtmlStrip]]'s scaladoc). */
  private[ops] def htmlCol =
    concat(lit("<html><body><p id=\""), col("doc_id"),
      lit("\">"), col("text"), lit("</p><br/>&amp;sect;</body></html>"))

  /** Spark side of the clean chain mirrored by `cleanedSql`. */
  private[ops] def cleanedCol = {
    val stripped = regexp_replace(htmlCol, "<[^>]*>", " ")
    val decoded = regexp_replace(
      regexp_replace(regexp_replace(stripped, "&amp;", "&"), "&lt;", "<"),
      "&gt;", ">")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** COLLOCATION strength by LIFT — which adjacent word pairs co-occur
    * far above chance: lift = P(w1,w2) / (P(w1)·P(w2)), the log-free
    * monotone twin of PMI (same ranking, no libm). Every probability
    * is a ratio of exact BIGINT counts cast to double, and the lift is
    * the IDENTICAL ieee expression tree in both engines — counts stay
    * exact in doubles to 2⁵³ (≈9·10¹⁵ tokens, beyond a 100 TB corpus),
    * so the doubles bit-match without any decimal gymnastics. A min
    * pair count ≥ 5 applies the standard collocation support floor.
    *
    * Scale posture: one pass tokenizes; unigram and bigram counts are
    * two partial-aggregated shuffles over words/pairs (small keys, not
    * documents); the two corpus totals ride in as broadcast single
    * rows ([[textDocFrequency]]'s pattern); the final join keys on the
    * bigram's words against the unigram frame — both sides are
    * vocabulary-sized, tiny next to the corpus. */
  def textCollocationLift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val toks = Tables.documents(s, d).select(tokens(col("text")).as("tok"))
    val n = size(col("tok"))
    val pairs = toks.filter(n >= 2)
      .select(explode(zip_with(
        slice(col("tok"), lit(1), n - 1), slice(col("tok"), lit(2), n - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = toks.select(explode(col("tok")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("nx"))
    val tTotal = toks.select(explode(col("tok")).as("t"))
      .agg(count(lit(1)).cast(DoubleType).as("t_total"))
    val bTotal = pairs.agg(count(lit(1)).cast(DoubleType).as("b_total"))
    val u1 = uni.select(col("t").as("w1"), col("nx").as("nx1"))
    val u2 = uni.select(col("t").as("w2"), col("nx").as("nx2"))
    pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= 5)
      .join(broadcast(u1), "w1").join(broadcast(u2), "w2")
      .crossJoin(broadcast(tTotal)).crossJoin(broadcast(bTotal))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"), col("n_xy"),
        ((col("n_xy").cast(DoubleType) / col("b_total")) /
          ((col("nx1").cast(DoubleType) / col("t_total")) *
           (col("nx2").cast(DoubleType) / col("t_total")))).as("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(40)
  }

  /** SENTENCE-level statistics — the readability/segment profile a
    * quality filter reads alongside token counts: split on terminal
    * punctuation runs ([.!?]+), trim, drop empties, then per doc the
    * sentence count, token total, mean tokens-per-sentence (one double
    * division of two exact ints) and the longest sentence. All list
    * work is codegen'd HOFs in one projection — no shuffle at all
    * before the presentation sort.
    *
    * Scale posture: pure map-side; a 100 TB corpus runs this at scan
    * speed. The rollup a monitor wants (per-source histograms) is one
    * partial-aggregated groupBy on top. */
  def textSentenceStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val sentences = filter(
      transform(split(col("text"), "[.!?]+"), x => trim(x)),
      x => x =!= "")
    val sentLens = transform(col("sents"),
      x => size(filter(split(x, "\\s+"), t => t =!= "")))
    Tables.documents(s, d)
      .select(col("doc_id"), sentences.as("sents"))
      .filter(size(col("sents")) > 0)
      .select(col("doc_id"), size(col("sents")).as("n_sentences"),
        sentLens.as("lens"))
      .select(col("doc_id"), col("n_sentences"),
        aggregate(col("lens"), lit(0), (a, b) => a + b).as("n_tokens"),
        array_max(col("lens")).as("max_sentence_len"))
      .select(col("doc_id"), col("n_sentences"), col("n_tokens"),
        (col("n_tokens").cast(DoubleType) /
          col("n_sentences").cast(DoubleType)).as("avg_sentence_len"),
        col("max_sentence_len"))
      .orderBy("doc_id")
  }

  /** CHUNK-LEVEL exact dedup (the paragraph/line-dedup step of a CCNet/
    * FineWeb-style pipeline, re-expressed over this corpus's newline-free
    * docs as fixed 10-token chunks): every doc is cut into consecutive
    * non-overlapping 10-token chunks (the trailing partial chunk drops,
    * docs under 10 tokens drop entirely — both engines alike), each
    * chunk's corpus-wide occurrence count is taken, and the per-doc
    * report says how many of its chunks are boilerplate (occur in more
    * than one place) and how many tokens survive chunk-level removal.
    *
    * Scale posture: chunks shuffle ONCE, keyed by md5(chunk) — a fixed
    * 32-byte key regardless of chunk text length, so the exchange width
    * is bounded (the same narrow-key argument as the shingle-hash
    * pipelines; an md5 collision would merge two counts identically in
    * both engines). The occurrence count is an unbounded window over
    * that key (count-only, no sort state beyond the hash cluster), and
    * the per-doc rollup partial-aggregates before its shuffle. */
  def textChunkDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val cw = 10
    val base = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("tok"))
      .withColumn("n_chunks", floor(size(col("tok")) / cw).cast(LongType))
      .filter(col("n_chunks") >= 1)
    val chunks = base.select(col("doc_id"), col("n_chunks"),
      explode(transform(
        sequence(lit(0), (col("n_chunks") - 1).cast(IntegerType)),
        i => array_join(slice(col("tok"), i * cw + 1, lit(cw)), " "))).as("chunk"))
    val occW = Window.partitionBy(md5(col("chunk")))
    chunks.withColumn("occ", count(lit(1)).over(occW))
      .groupBy("doc_id")
      .agg(min(col("n_chunks")).as("n_chunks"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        ((col("n_chunks") - col("n_dup_chunks")) * cw).as("kept_tokens"))
      .orderBy("doc_id")
  }

  /** Corpus-trained bigram language-model fluency score — the shape of
    * CCNet's LM-perplexity filter, self-scored on the corpus it is
    * trained on: each doc's score is the mean add-one-smoothed transition
    * probability (c(w_i,w_{i+1}) + 1) / (c_left(w_i) + V) over its
    * bigrams, where c_left counts the word as a bigram LEFT context and V
    * is the corpus vocabulary size. The mean of RAW probabilities stands
    * in for mean log-prob deliberately: `ln` is not guaranteed correctly
    * rounded in either engine (the same reason [[graft.ops.DedupQueries
    * .textTfidfCosine]] weights by N/df without the log), while each term
    * here is one IEEE division of exact integer-derived operands and the
    * per-doc sum is a position-ordered left fold seeded 0.0 — the repo's
    * standard bit-identical cross-engine summation.
    *
    * Scale posture: bigram rows shuffle by bigram text then by left word
    * (two partial-width exchanges over vocabulary-sized keys), the two
    * corpus globals ride in as one broadcast row, and the per-doc fold
    * shuffles each doc's (position, term) pairs once. No join carries
    * document text. */
  def textLmBigramScore(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("tok"))
    val vocab = toks.select(explode(col("tok")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val big = toks.filter(size(col("tok")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), (size(col("tok")) - 1).cast(IntegerType)),
        i => struct(i.as("pos"),
          concat_ws(" ", element_at(col("tok"), i),
            element_at(col("tok"), i + 1)).as("bg"),
          element_at(col("tok"), i).as("w1")))).as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"),
        col("p.bg").as("bg"), col("p.w1").as("w1"))
    val cb = Window.partitionBy("bg")
    val cl = Window.partitionBy("w1")
    big
      .withColumn("c_bg", count(lit(1)).over(cb))
      .withColumn("c_left", count(lit(1)).over(cl))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("pos"),
        ((col("c_bg") + 1).cast(DoubleType) /
          (col("c_left") + col("v")).cast(DoubleType)).as("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(
          sort_array(collect_list(struct(col("pos"), col("term")))),
          lit(0.0), (acc, x) => acc + x.getField("term")).as("psum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("psum") / col("n_bigrams").cast(DoubleType)).as("avg_transition_p"))
      .orderBy("doc_id")
  }

  /** RAKE keyphrase extraction (Rose et al. 2010), stated relationally:
    * phrases are maximal stop-word-free token runs (phrase id = running
    * stop-word count before the position — ONE prefix-sum window per
    * doc), capped at 4 tokens; word score = degree/freq where degree
    * sums the lengths of every phrase the word occurs in; phrase score
    * = Σ of its words' scores via the position-ordered fold. Identical
    * word multisets give identical scores, so the distinct-phrase
    * rollup takes MIN (= the value) and counts occurrences; top-20 by
    * (score, phrase).
    *
    * Scale posture: the prefix sum shares the per-doc exchange, word
    * stats are one vocabulary-keyed shuffle, the score join carries
    * only (word, score) pairs, and the final cut is TakeOrdered. */
  def textRakeKeyphrases(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val docW = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("is_stop", col("w").isin(stopwords: _*))
      .withColumn("phrase_id",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(docW))
    val phrases = toks.filter(!col("is_stop"))
      .groupBy("doc_id", "phrase_id")
      .agg(array_join(transform(sort_array(collect_list(
          struct(col("pos"), col("w")))), x => x.getField("w")), " ")
          .as("phrase"),
        count(lit(1)).as("plen"))
      .filter(col("plen") <= 4)
    val words = phrases
      .select(col("phrase"), col("plen"),
        posexplode(split(col("phrase"), " ")).as(Seq("wpos", "w")))
    val stats = words.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      .select(col("w"),
        (col("degree").cast(DoubleType) / col("freq").cast(DoubleType))
          .as("wscore"))
    words.join(stats, Seq("w"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_words_total"),
        aggregate(
          sort_array(collect_list(struct(col("wpos"), col("wscore")))),
          lit(0.0), (acc, x) => acc + x.getField("wscore")).as("allsum"))
      .select(col("phrase"),
        // allsum folded ALL occurrences' word scores; one occurrence's
        // score = allsum / n_occurrences, with n_occurrences =
        // n_words_total / words-in-phrase
        (col("allsum") / (col("n_words_total").cast(DoubleType) /
          size(split(col("phrase"), " ")).cast(DoubleType))).as("score"),
        (col("n_words_total") / size(split(col("phrase"), " ")))
          .cast("long").as("n_occurrences"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(20)
  }

  /** FEATURE HASHING (Weinberger 2009, the "hashing trick") — the
    * fixed-width vectorizer a learned quality classifier or fasttext-
    * style model consumes: token → feature index = md5-fold mod 1024,
    * with a SIGNED contribution (±1 from an independent hash bit) so
    * collisions cancel in expectation instead of biasing upward — the
    * property that lets the width stay fixed while the vocabulary is
    * unbounded (no vocab build, no dictionary broadcast: the defining
    * scale advantage over count-vectorizers at 100 TB). Output is the
    * sparse (doc, index, value) triple stream a trainer ingests.
    *
    * Determinism: both hashes are the suite's md5+integer arithmetic;
    * values are exact signed-count integers.
    *
    * Scale posture: one explode + one partial-aggregated shuffle on
    * (doc, index); no joins, no vocabulary state anywhere. */
  def textFeatureHashing(s: SparkSession, d: String): DataFrame = {
    import graft.dedup.Dedup.hexFold32
    import graft.text.TextAnalysis.tokens
    val idx = pmod(hexFold32(md5(concat(lit("fh:"), col("tok")))), lit(1024L))
    val sign = lit(1L) - lit(2L) *
      pmod(hexFold32(md5(concat(lit("fs:"), col("tok")))), lit(2L))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), idx.as("feature_idx"), sign.as("sgn"))
      .groupBy("doc_id", "feature_idx")
      .agg(sum(col("sgn")).as("value"))
      .filter(col("value") =!= 0L) // cancelled collisions carry no signal
      .orderBy("doc_id", "feature_idx")
  }

  /** HAPAX-LEGOMENA profile per language — the vocabulary-tail health
    * metric corpus linguists (and tokenizer trainers) read first: a
    * natural corpus keeps ~40-60% of its vocabulary at frequency 1
    * (Zipf tail); template-generated or heavily-duplicated text
    * collapses the ratio, making it a cheap corpus-quality signal
    * before any model sees the data.
    *
    * Determinism: pure integer counts; the single ratio division has
    * identical operands cross-engine (round 9 for belt and braces).
    * Scale posture: one token explode + two partial-aggregated keyed
    * shuffles ((lang, tok) then lang) — the text_doc_frequency shape. */
  def textHapaxRatio(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("freq"))
      .groupBy("lang")
      .agg(count(lit(1)).as("vocab_size"),
        sum(when(col("freq") === 1, 1L).otherwise(0L)).as("hapax_count"),
        sum(col("freq")).as("total_tokens"))
      .withColumn("hapax_ratio",
        round(col("hapax_count").cast("double") /
          col("vocab_size").cast("double"), 9))
      .orderBy("lang")

  /** TOKENIZER FERTILITY per language — subword tokens per word (the
    * number a tokenizer owner tracks per language: high fertility means
    * the vocabulary splits that language's words into many pieces and
    * its token budget buys less text). Uses the suite's deterministic
    * BPE-ish count over the whitespace tokenizer; ratio is one double
    * division over exact BIGINT sums, round 9. One partial-aggregated
    * rollup per language. */
  def textTokenizerFertility(s: SparkSession, d: String): DataFrame = {
    import graft.text.TextAnalysis.{approxBpeCount, tokenCount}
    Tables.documents(s, d)
      .select(col("lang"), tokenCount(col("text")).cast("long").as("words"),
        approxBpeCount(col("text")).as("bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("words")).as("total_words"),
        sum(col("bpe")).as("total_subwords"))
      .withColumn("fertility",
        round(col("total_subwords").cast("double") /
          col("total_words").cast("double"), 9))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokenizer_fertility" -> textTokenizerFertility _,
    "text_hapax_ratio"      -> textHapaxRatio _,
    "text_feature_hashing"  -> textFeatureHashing _,
    "text_rake_keyphrases"  -> textRakeKeyphrases _,
    "text_chunk_dedup"      -> textChunkDedup _,
    "text_lm_bigram_score"  -> textLmBigramScore _,
    "text_langid_confusion" -> textLangidConfusion _,
    "text_sentence_stats"   -> textSentenceStats _,
    "text_collocation_lift" -> textCollocationLift _,
    "text_quality_calibrate" -> textQualityCalibrate _,
    "text_html_strip"       -> textHtmlStrip _,
    "text_repetition_score" -> textRepetitionScore _,
    "text_doc_frequency"   -> textDocFrequency _,
    "sample_hash_split"    -> sampleHashSplit _,
    "text_bigram_freq"     -> textBigramFreq _,
    "text_token_count"     -> textTokenCount _,
    "text_quality_score"   -> textQualityScore _,
    "text_lang_id"         -> textLangId _,
    "text_fingerprint"     -> textFingerprint _,
    "text_bpe_budget"      -> textBpeBudget _,
    "text_curation_funnel" -> textCurationFunnel _,
  )

  private[ops] def tokensSqlOf(c: String) =
    s"list_filter(string_split_regex(lower($c), '\\s+'), t -> t <> '')"
  private[ops] val tokensSql = tokensSqlOf("text")
  private[ops] def markSqlOf(c: String, words: Seq[String]) =
    s"len(list_filter(${tokensSqlOf(c)}, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
  private[ops] def markSql(words: Seq[String]) = markSqlOf("text", words)

  /** Mirrors `stopwordRatio($c, stopwords)` on an arbitrary column. */
  private[ops] def ratioSqlOf(c: String) =
    s"""CAST(${markSqlOf(c, stopwords)} AS DOUBLE) /
       |    CAST(NULLIF(len(${tokensSqlOf(c)}), 0) AS DOUBLE)""".stripMargin

  /** Mirrors [[textHtmlStrip]]'s synthesized-markup clean chain. */
  private[ops] val cleanedSql =
    """trim(regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace('<html><body><p id="' || doc_id || '">' || text ||
      |          '</p><br/>&amp;sect;</body></html>', '<[^>]*>', ' ', 'g'),
      |      '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
      |    '\s+', ' ', 'g'))""".stripMargin

  // ---- shared oracle fragments mirroring [[curationGate]] / bpe count —
  // the single source of truth for the thresholds on the SQL side ----

  /** FROM-clause subquery ranking exact-dup survivors. */
  private[ops] val survivorFromSql =
    """(SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
      |      FROM documents)""".stripMargin

  /** Mirrors `isQuality(text, stopwords)`. */
  private[ops] val qualityGateSql =
    s"""COALESCE(len($tokensSql) >= 20 AND len($tokensSql) <= 1000 AND
       |    CAST(${markSql(stopwords)} AS DOUBLE) /
       |      CAST(NULLIF(len($tokensSql), 0) AS DOUBLE) < 0.5, false)""".stripMargin

  /** Mirrors `langId(text, generic/sqlish/dataish)`. */
  private[ops] val langCaseSql =
    s"""(CASE
       |    WHEN ${markSql(dataWords)} > ${markSql(sqlWords)}
       |     AND ${markSql(dataWords)} > ${markSql(stopwords)} THEN 'dataish'
       |    WHEN ${markSql(sqlWords)} > ${markSql(stopwords)} THEN 'sqlish'
       |    ELSE 'generic' END)""".stripMargin

  /** Mirrors `approxBpeCount(text)`. */
  private[ops] val bpeSql =
    s"""list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform($tokensSql, t -> CAST(length(t) AS BIGINT))),
       |    (acc, x) -> acc + 1 + (x - 1) // 6)""".stripMargin

  private def fold32Sql(arg: String): String = OracleSql.fold32(arg)

  /** Mirrors `stopwordRatio(text, stopwords)`. */
  private val ratioSql = ratioSqlOf("text")

  val oracle: Map[String, String] = Map(
    "text_tokenizer_fertility" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(len($tokensSql) AS BIGINT)) AS BIGINT) AS total_words,
         |  CAST(SUM($bpeSql) AS BIGINT) AS total_subwords,
         |  ROUND(CAST(SUM($bpeSql) AS DOUBLE) /
         |    CAST(SUM(CAST(len($tokensSql) AS BIGINT)) AS DOUBLE), 9)
         |    AS fertility
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "text_hapax_ratio" ->
      s"""WITH t AS (SELECT lang, unnest($tokensSql) AS tok FROM documents),
         |f AS (SELECT lang, tok, COUNT(*) AS freq FROM t GROUP BY 1, 2)
         |SELECT lang, COUNT(*) AS vocab_size,
         |  CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
         |  CAST(SUM(freq) AS BIGINT) AS total_tokens,
         |  ROUND(CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
         |        CAST(COUNT(*) AS DOUBLE), 9) AS hapax_ratio
         |FROM f GROUP BY lang ORDER BY lang""".stripMargin,
    "text_feature_hashing" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${tokensSqlOf("text")}) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id,
         |    (${OracleSql.fold32("'fh:' || tok")}) % 1024 AS feature_idx,
         |    1 - 2 * ((${OracleSql.fold32("'fs:' || tok")}) % 2) AS sgn
         |  FROM toks)
         |SELECT doc_id, feature_idx, CAST(SUM(sgn) AS BIGINT) AS value
         |FROM h GROUP BY 1, 2
         |HAVING CAST(SUM(sgn) AS BIGINT) <> 0
         |ORDER BY doc_id, feature_idx""".stripMargin,
    "text_rake_keyphrases" ->
      s"""WITH toks AS (
         |  SELECT doc_id, p.pos AS pos, p.w AS w FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(tok)+1),
         |      i -> struct_pack(pos := i, w := tok[i]))) AS p
         |    FROM (SELECT doc_id, $tokensSql AS tok FROM documents))),
         |marked AS (
         |  SELECT doc_id, pos, w, w IN ('the','a') AS is_stop,
         |    CAST(SUM(CASE WHEN w IN ('the','a') THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY doc_id ORDER BY pos
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS phrase_id
         |  FROM toks),
         |phrases AS (
         |  SELECT doc_id, phrase_id,
         |    array_to_string(list(w ORDER BY pos), ' ') AS phrase,
         |    COUNT(*) AS plen
         |  FROM marked WHERE NOT is_stop GROUP BY doc_id, phrase_id
         |  HAVING COUNT(*) <= 4),
         |words AS (
         |  SELECT phrase, plen, q.wpos AS wpos, q.w AS w FROM (
         |    SELECT phrase, plen,
         |      unnest(list_transform(range(1, len(string_split(phrase, ' '))+1),
         |        i -> struct_pack(wpos := i, w := string_split(phrase, ' ')[i])))
         |        AS q
         |    FROM phrases)),
         |stats AS (
         |  SELECT w, CAST(SUM(plen) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS wscore
         |  FROM words GROUP BY w),
         |j AS (SELECT words.phrase, words.wpos, stats.wscore
         |  FROM words JOIN stats USING (w)),
         |agg AS (
         |  SELECT phrase, COUNT(*) AS n_words_total,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(wscore ORDER BY wpos, wscore)), (s, x) -> s + x) AS allsum
         |  FROM j GROUP BY phrase)
         |SELECT phrase,
         |  allsum / (CAST(n_words_total AS DOUBLE) /
         |    CAST(len(string_split(phrase, ' ')) AS DOUBLE)) AS score,
         |  CAST(n_words_total / len(string_split(phrase, ' ')) AS BIGINT)
         |    AS n_occurrences
         |FROM agg ORDER BY score DESC, phrase LIMIT 20""".stripMargin,
    "text_chunk_dedup" ->
      s"""WITH base AS (
         |  SELECT doc_id, $tokensSql AS tok,
         |    CAST(floor(len($tokensSql) / 10) AS BIGINT) AS n_chunks
         |  FROM documents),
         |chunks AS (
         |  SELECT doc_id, n_chunks,
         |    unnest(list_transform(range(0, n_chunks),
         |      i -> array_to_string(list_slice(tok, CAST(i*10+1 AS INTEGER),
         |                                           CAST(i*10+10 AS INTEGER)), ' '))) AS chunk
         |  FROM base WHERE n_chunks >= 1),
         |occ AS (
         |  SELECT doc_id, n_chunks,
         |    COUNT(*) OVER (PARTITION BY md5(chunk)) AS occ
         |  FROM chunks)
         |SELECT doc_id, MIN(n_chunks) AS n_chunks,
         |  CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_chunks,
         |  CAST((MIN(n_chunks) - SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END)) * 10
         |    AS BIGINT) AS kept_tokens
         |FROM occ GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_lm_bigram_score" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS tok FROM documents),
         |v AS (SELECT COUNT(DISTINCT t) AS v FROM
         |  (SELECT unnest(tok) AS t FROM toks)),
         |big AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(tok)),
         |      i -> struct_pack(pos := i, bg := tok[i] || ' ' || tok[i+1],
         |                       w1 := tok[i]))) AS p
         |  FROM toks WHERE len(tok) >= 2),
         |flat AS (SELECT doc_id, p.pos AS pos, p.bg AS bg, p.w1 AS w1 FROM big),
         |terms AS (
         |  SELECT doc_id, pos,
         |    CAST(COUNT(*) OVER (PARTITION BY bg) + 1 AS DOUBLE) /
         |    CAST(COUNT(*) OVER (PARTITION BY w1) + (SELECT v FROM v) AS DOUBLE)
         |      AS term
         |  FROM flat)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(term ORDER BY pos)), (s, x) -> s + x) /
         |    CAST(COUNT(*) AS DOUBLE) AS avg_transition_p
         |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_langid_confusion" ->
      s"""WITH p AS (SELECT lang, CASE
         |    WHEN ${markSql(dataWords)} > ${markSql(sqlWords)}
         |     AND ${markSql(dataWords)} > ${markSql(stopwords)} THEN 'dataish'
         |    WHEN ${markSql(sqlWords)} > ${markSql(stopwords)} THEN 'sqlish'
         |    ELSE 'generic' END AS pred_lang
         |  FROM documents),
         |m AS (SELECT lang, pred_lang, COUNT(*) AS n
         |  FROM p GROUP BY 1, 2)
         |SELECT lang, pred_lang, n,
         |  CAST(n AS DOUBLE) /
         |    CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE)
         |    AS share_of_label
         |FROM m ORDER BY lang, pred_lang""".stripMargin,
    "text_sentence_stats" ->
      """WITH s AS (SELECT doc_id,
        |    list_filter(list_transform(string_split_regex(text, '[.!?]+'),
        |      x -> trim(x)), x -> x <> '') AS sents
        |  FROM documents),
        |l AS (SELECT doc_id, len(sents) AS n_sentences,
        |    list_transform(sents, x ->
        |      len(list_filter(string_split_regex(x, '\s+'), t -> t <> '')))
        |      AS lens
        |  FROM s WHERE len(sents) > 0)
        |SELECT doc_id, n_sentences,
        |  list_reduce(list_prepend(0, lens), (a, b) -> a + b) AS n_tokens,
        |  CAST(list_reduce(list_prepend(0, lens), (a, b) -> a + b)
        |      AS DOUBLE) / CAST(n_sentences AS DOUBLE) AS avg_sentence_len,
        |  list_aggregate(lens, 'max') AS max_sentence_len
        |FROM l ORDER BY doc_id""".stripMargin,
    "text_collocation_lift" ->
      s"""WITH tok AS (SELECT $tokensSql AS tok FROM documents),
         |t AS (SELECT unnest(tok) AS t FROM tok),
         |uni AS (SELECT t, COUNT(*) AS nx FROM t GROUP BY t),
         |tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t_total FROM t),
         |big AS (SELECT
         |    unnest(list_transform(range(1, len(tok)), i -> tok[i])) AS w1,
         |    unnest(list_transform(range(1, len(tok)), i -> tok[i+1])) AS w2
         |  FROM tok WHERE len(tok) >= 2),
         |bt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS b_total FROM big),
         |bc AS (SELECT w1, w2, COUNT(*) AS n_xy FROM big GROUP BY w1, w2)
         |SELECT w1 || ' ' || w2 AS bigram, n_xy,
         |  (CAST(n_xy AS DOUBLE) / b_total) /
         |    ((CAST(u1.nx AS DOUBLE) / t_total) *
         |     (CAST(u2.nx AS DOUBLE) / t_total)) AS lift
         |FROM bc
         |JOIN uni u1 ON bc.w1 = u1.t
         |JOIN uni u2 ON bc.w2 = u2.t
         |CROSS JOIN tt CROSS JOIN bt
         |WHERE n_xy >= 5
         |ORDER BY lift DESC, bigram LIMIT 40""".stripMargin,
    "text_quality_calibrate" ->
      s"""WITH sc AS (
         |  SELECT doc_id, lang, $ratioSql AS score FROM documents),
         |r AS (
         |  SELECT lang, score,
         |    CAST(ntile(10) OVER (PARTITION BY lang ORDER BY score, doc_id)
         |      AS INTEGER) AS decile
         |  FROM sc WHERE score IS NOT NULL)
         |SELECT lang, decile, COUNT(*) AS n, MIN(score) AS lo, MAX(score) AS hi
         |FROM r GROUP BY lang, decile ORDER BY lang, decile""".stripMargin,
    "text_html_strip" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><body><p id="' || doc_id || '">' || text ||
         |      '</p><br/>&amp;sect;</body></html>' AS html,
         |    $cleanedSql AS cleaned
         |  FROM documents)
         |SELECT doc_id, length(html) AS raw_len, cleaned,
         |  length(html) - length(cleaned) AS n_stripped
         |FROM h ORDER BY doc_id""".stripMargin,
    "text_repetition_score" ->
      s"""SELECT doc_id,
         |  CAST(SUM(n) AS BIGINT) AS n_tokens,
         |  COUNT(*) AS n_types,
         |  MAX(n) AS max_cnt,
         |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS ttr,
         |  CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_frac,
         |  (CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) > 0.2 OR
         |   CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) < 0.3) AS is_repetitive
         |FROM (
         |  SELECT doc_id, token, COUNT(*) AS n FROM (
         |    SELECT doc_id, unnest($tokensSql) AS token FROM documents)
         |  GROUP BY doc_id, token)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_doc_frequency" ->
      s"""SELECT token, df,
         |  CAST(df AS DOUBLE) /
         |    (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS df_frac
         |FROM (
         |  SELECT token, COUNT(*) AS df FROM (
         |    SELECT DISTINCT doc_id, unnest($tokensSql) AS token FROM documents)
         |  GROUP BY token)
         |ORDER BY df DESC, token LIMIT 40""".stripMargin,
    "sample_hash_split" ->
      s"""SELECT CASE WHEN (${fold32Sql("'split:' || CAST(doc_id AS VARCHAR)")}) % 100 < 90
         |    THEN 'train' ELSE 'holdout' END AS split,
         |  COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,
    "text_bigram_freq" ->
      s"""SELECT bigram, COUNT(*) AS n FROM (
         |  SELECT unnest(list_transform(range(1, len(tok)),
         |    i -> tok[i] || ' ' || tok[i+1])) AS bigram
         |  FROM (SELECT $tokensSql AS tok FROM documents) WHERE len(tok) >= 2)
         |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30""".stripMargin,
    "text_token_count" ->
      s"""SELECT token, COUNT(*) AS n FROM (
         |  SELECT unnest($tokensSql) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "text_quality_score" ->
      s"""SELECT doc_id,
         |  len($tokensSql) AS n_tokens,
         |  ${markSql(stopwords)} AS n_stop,
         |  CAST(${markSql(stopwords)} AS DOUBLE) /
         |    CAST(NULLIF(len($tokensSql), 0) AS DOUBLE) AS stop_ratio,
         |  COALESCE(len($tokensSql) >= 20 AND len($tokensSql) <= 1000 AND
         |    CAST(${markSql(stopwords)} AS DOUBLE) /
         |      CAST(NULLIF(len($tokensSql), 0) AS DOUBLE) < 0.5, false)
         |    AS is_quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      s"""SELECT doc_id,
         |  ${markSql(stopwords)} AS n_art,
         |  ${markSql(sqlWords)} AS n_sql,
         |  ${markSql(dataWords)} AS n_data,
         |  CASE
         |    WHEN ${markSql(dataWords)} > ${markSql(sqlWords)}
         |     AND ${markSql(dataWords)} > ${markSql(stopwords)} THEN 'dataish'
         |    WHEN ${markSql(sqlWords)} > ${markSql(stopwords)} THEN 'sqlish'
         |    ELSE 'generic' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS fp_md5,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform($tokensSql, t -> CAST(length(t) AS BIGINT))),
         |    (h, x) -> (h * 31 + x) % 1000000007) AS fp_roll
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_bpe_budget" ->
      s"""SELECT source,
         |  CAST(SUM($bpeSql) AS BIGINT) AS bpe_tokens,
         |  COUNT(*) AS n_docs
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "text_curation_funnel" ->
      s"""SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM($bpeSql) AS BIGINT) AS bpe_tokens
         |FROM $survivorFromSql
         |WHERE rk = 1
         |  AND $qualityGateSql
         |  AND $langCaseSql <> 'sqlish'
         |GROUP BY source ORDER BY source""".stripMargin,
  )
}
