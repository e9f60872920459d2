package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Declared multimodal queries. The driver corpus has no binary table,
  * so the declared query materializes one (text → UTF-8 bytes) and runs
  * the metadata stage — the decode stages are covered by
  * MultimodalSpec (no SQL oracle can express the codec contract). */
object MultimodalQueries {

  /** Byte-level metadata over an opaque binary column: size,
    * fingerprint, pseudo-dimensions (hash-derived header-sniff
    * stand-in). Whole-stage-codegen throughout — no decode. */
  def multimodalBinaryMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.binaryMeta(
      Tables.documents(s, d).select(col("doc_id"),
        encode(col("text"), "UTF-8").as("content")), "content")
      .select(col("doc_id"), col("n_bytes"), col("fingerprint"),
        col("pseudo_width"), col("pseudo_height"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_binary_meta" -> multimodalBinaryMeta _,
  )

  val oracle: Map[String, String] = Map(
    "multimodal_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS fingerprint,
        |  ascii(substr(md5(text), 1, 1)) % 64 + 1 AS pseudo_width,
        |  ascii(substr(md5(text), 2, 1)) % 64 + 1 AS pseudo_height
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
