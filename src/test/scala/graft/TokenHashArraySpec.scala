package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.TokenHashArray

/** Differential test: the native codegen'd TokenHashArray must agree
  * element-for-element with the built-ins-only HOF formulation (and
  * therefore with the DuckDB oracle arithmetic). */
class TokenHashArraySpec extends SparkTestBase {

  test("native expression equals the HOF formulation on the documents corpus") {
    val base = ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("tok"))
    val both = base.select(
      TokenHashArray.tokenHashes(col("tok")).as("native"),
      Dedup.tokenHashesHof(col("tok")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("handles empty arrays and unicode tokens") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("a", "ção", ""), Seq("x")).toDF("tok")
    val rows = df.select(TokenHashArray.tokenHashes(col("tok")).as("h"),
      Dedup.tokenHashesHof(col("tok")).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("stays inside whole-stage codegen in a plain projection") {
    import spark.implicits._
    val df = Seq(Seq("a", "b")).toDF("tok")
      .select(TokenHashArray.tokenHashes(col("tok")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("type check rejects non-array input") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq("x").toDF("s").select(TokenHashArray.tokenHashes(col("s"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
