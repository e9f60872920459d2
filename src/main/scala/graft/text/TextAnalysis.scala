package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines
  * (north-star extension; the reference has no text ops — its strings are
  * only cleaned/normalized, `/root/reference/etl_process.py:10–15`).
  *
  * Everything here is a pure `Column` function over built-in higher-order
  * functions — codegen-friendly, no UDFs, no shuffles. Each scales
  * embarrassingly: one pass over the document partition.
  */
object TextAnalysis {

  /** Whitespace tokenizer; empty tokens dropped (leading/trailing/double
    * spaces). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: words plus an extra unit per 6
    * chars of word length beyond the first 6 — a deterministic stand-in
    * for a tokenizer vocabulary, useful for token-budget accounting. */
  def approxBpeCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + lit(1L) +
        floor((length(t).cast(LongType) - lit(1L)) / lit(6.0)).cast(LongType))

  /** How many tokens fall in `words`. */
  def markerCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** Stopword ratio in [0,1]; null for empty documents (never divides by
    * zero — Spark 4 ANSI mode would throw). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text)
    markerCount(text, stopwords).cast(DoubleType) /
      nullif(n, lit(0)).cast(DoubleType)
  }

  /** Quality heuristic: length band + bounded stopword ratio (the
    * punctuation-ratio term is zero on the synthetic corpus but included
    * for real text). */
  def isQuality(text: Column, stopwords: Seq[String],
      minTokens: Int = 20, maxTokens: Int = 1000,
      maxStopRatio: Double = 0.5): Column = {
    val n = tokenCount(text)
    val ratio = stopwordRatio(text, stopwords)
    coalesce(
      n.geq(minTokens) && n.leq(maxTokens) && ratio < maxStopRatio,
      lit(false))
  }

  /** Language ID by marker-token argmax over `markers` (lang → marker
    * words). Deterministic tiebreak: first language in declaration order
    * wins ties. A char-n-gram model would slot in the same shape; the
    * synthetic corpus has no real cross-language signal to learn. */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val counts = markers.map { case (lang, ws) => lang -> markerCount(text, ws) }
    // fold: start with first lang, replace when a later lang strictly wins
    counts.tail.foldLeft(lit(counts.head._1) -> counts.head._2) {
      case ((bestLang, bestCnt), (lang, cnt)) =>
        (when(cnt > bestCnt, lit(lang)).otherwise(bestLang),
          when(cnt > bestCnt, cnt).otherwise(bestCnt))
    }._1
  }

  /** Polynomial rolling hash over token lengths — a cheap order-sensitive
    * document fingerprint (same shape as Rabin-Karp; modulus keeps the
    * accumulator bounded so ANSI overflow checking never trips). */
  def rollingFingerprint(text: Column, mod: Long = 1000000007L): Column =
    aggregate(
      transform(tokens(text), t => length(t).cast(LongType)),
      lit(0L),
      (h, x) => (h * 31L + x) % mod)

  /** Exact content fingerprint (hex md5). */
  def contentFingerprint(text: Column): Column = md5(text)
}
