package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.dedup.Dedup
import graft.similarity.Vectors

/** Differential tests: every native codegen'd expression added for the
  * dedup/similarity hot paths must agree with its retained built-ins-only
  * HOF formulation — element-for-element for the integer pipelines,
  * BIT-for-bit for the IEEE vector math (both sides use the identical
  * widen→multiply-in-order→left-fold sequence). The HOF forms are what
  * the DuckDB oracles mirror, so native ≡ HOF ⇒ native ≡ oracle. */
class NativeExprsSpec extends SparkTestBase with TableDrivenPropertyChecks {

  private def docBase = {
    val d = ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("tok"))
    d.select(col("doc_id"), size(col("tok")).as("n"),
      Dedup.tokenHashes(col("tok")).as("th"))
  }

  test("shingle_hashes3 equals the HOF formulation on the documents corpus") {
    val both = docBase.select(
      Dedup.shingleHashes(col("th")).as("native"),
      Dedup.shingleHashesHof(col("th")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("shingle_hashes3 on short arrays yields empty, preserving first-occurrence order") {
    import spark.implicits._
    val df = Seq(
      Seq.empty[Long], Seq(1L), Seq(1L, 2L),          // < 3 tokens → empty
      Seq(5L, 5L, 5L, 5L, 5L),                        // repeats → one distinct shingle
      Seq(7L, 1L, 9L, 7L, 1L, 9L, 7L)                 // wraparound duplicates
    ).toDF("th")
    val rows = df.select(Dedup.shingleHashes(col("th")).as("native"),
      Dedup.shingleHashesHof(col("th")).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("minhash_signature equals the HOF formulation on the shingled corpus") {
    val sh = docBase.select(Dedup.shingleHashes(col("th")).as("sh"))
    val both = sh.select(
      Dedup.minhashSignature(col("sh"), 8).as("native"),
      Dedup.minhashSignatureHof(col("sh"), 8).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("minhash_signature of an empty set is all-P (+infinity)") {
    import spark.implicits._
    val rows = Seq(Seq.empty[Long]).toDF("sh")
      .select(Dedup.minhashSignature(col("sh"), 4)).collect()
    assert(rows.head.getSeq[Long](0) == Seq.fill(4)(Dedup.MinhashP))
  }

  test("simhash32 equals the HOF formulation on the documents corpus") {
    val both = docBase.filter(col("n") > 0).select(
      Dedup.simhash32(col("th"), col("n")).as("native"),
      Dedup.simhash32Hof(col("th"), col("n")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("vec_dot / vec_norm_sq are bit-identical to the HOF IEEE fold on embeddings") {
    val e = ops.Tables.embeddings(spark, sfDir).limit(200)
    val probe = e.select(col("embedding").as("q")).limit(1)
    val both = e.crossJoin(broadcast(probe)).select(
      Vectors.dot(col("embedding"), col("q")).as("dn"),
      Vectors.dotHof(col("embedding"), col("q")).as("dh"),
      Vectors.normSq(col("embedding")).as("nn"),
      Vectors.normSqHof(col("embedding")).as("nh"))
    // bit-identical: compare with =!= (exact), not a tolerance
    assert(both.filter(col("dn") =!= col("dh") || col("nn") =!= col("nh")).count() == 0)
  }

  test("vec_dot nulls on length mismatch, like zip_with padding") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val rows = df.select(Vectors.dot(col("a"), col("b")).as("d"),
      Vectors.dotHof(col("a"), col("b")).as("h")).collect()
    assert(rows.head.isNullAt(0) && rows.head.isNullAt(1))
  }

  test("native dedup/vector expressions stay inside whole-stage codegen") {
    import spark.implicits._
    val plan = Seq((Seq(1L, 2L, 3L), Seq(1.0f), 3))
      .toDF("th", "v", "n")
      .select(
        Dedup.shingleHashes(col("th")).as("sh"),
        Dedup.simhash32(col("th"), col("n")).as("sim"),
        Vectors.normSq(col("v")).as("nsq"))
      .select(Dedup.minhashSignature(col("sh"), 8), col("sim"), col("nsq"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("SQL registration exposes the native expressions") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT minhash_signature(shingle_hashes3(token_hash32_array(array('a','b','c','d'))), 4) AS sig,
        |       simhash32(token_hash32_array(array('a','b')), 2) AS sim,
        |       vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       vec_norm_sq(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS nsq
        |""".stripMargin).collect().head
    assert(r.getSeq[Long](0).length == 4)
    assert(r.getDouble(2) == 11.0 && r.getDouble(3) == 25.0)
  }

  test("minhash_signature rejects a non-literal k with a clear error") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql(
        """SELECT minhash_signature(shingle_hashes3(token_hash32_array(array('a','b','c'))), n)
          |FROM VALUES (4) AS t(n)""".stripMargin).collect()
    }
    // the require message must survive Spark's analysis-error wrapping
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("k must be a literal")), e.toString)
  }

  test("minhash_signature enforces the overflow-audited k bound") {
    val e = intercept[IllegalArgumentException] {
      graft.functions.MinhashSignature(
        org.apache.spark.sql.catalyst.expressions.Literal(Array(1L)), 5000)
    }
    assert(e.getMessage.contains("4096"))
  }

  test("cdc_cuts equals the HOF formulation on the documents corpus") {
    val both = ops.Tables.documents(spark, sfDir).select(
      graft.functions.CdcCuts.cdcCuts(col("text"), 8, 64L, 1048576L)
        .as("native"),
      ops.FrontierQueriesP.cdcCutsHof(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("cdc_cuts edge cases: empty, sub-window, exact-window, boundary-at-end") {
    import spark.implicits._
    // lengths 0..w and w+1, plus a 12-space run whose window hash
    // exercises the mask filter on a repetitive string
    val cases = Seq("a", "abcdefg", "abcdefgh", "abcdefghi",
      " " * 12, "same same same same same", "x" * 200)
    val rows = cases.toDF("text").select(col("text"),
      graft.functions.CdcCuts.cdcCuts(col("text"), 8, 64L, 1048576L)
        .as("native"),
      ops.FrontierQueriesP.cdcCutsHof(col("text")).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2), r.getString(0)))
    // sub-window strings carry only the [0, n] sentinels
    assert(rows.find(_.getString(0) == "a").get.getSeq[Long](1) == Seq(0L, 1L))
    // EMPTY input is the one deliberate HOF divergence: split("", "")
    // yields [""] so the HOF reports n = 1 ([0, 1] — a phantom length-1
    // chunk over zero characters), while the native form and the DuckDB
    // oracle (strlen = 0) agree on [0, 0], which the e > s chunk filter
    // then drops. No empty documents exist in any corpus (oracle-
    // checked); the native/oracle semantics are the correct ones.
    val empty = Seq("").toDF("text").select(
      graft.functions.CdcCuts.cdcCuts(col("text"), 8, 64L, 1048576L)).collect()
    assert(empty.head.getSeq[Long](0) == Seq(0L, 0L))
  }

}
