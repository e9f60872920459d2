package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.Column
import graft.similarity.Vectors._

/** Declared similarity-search queries over `embeddings` (north-star
  * extension; the reference has no vector search).
  *
  * Scale posture: the probe side is a single broadcast row, so the scan
  * side never shuffles — brute force is one embarrassing pass
  * (map-side top-k via TakeOrderedAndProject). The LSH variant prunes
  * the scan to one sign-bucket (~1/2^bits of the data) BEFORE the
  * distance math — the same plan shape an IVF index gives, expressed as
  * a filter Catalyst pushes down.
  */
object SimilarityQueries {

  private val ProbeId = 1L

  /** Scan with the squared norm precomputed once per row — every query
    * divides by sqrt(nsq·qnsq), so the per-pair work is one dot product.
    * Same IEEE op sequence as inlined cosine (bit-identical results). */
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("label"), col("embedding"),
      normSq(col("embedding")).as("nsq"))

  private def cosPre(q: Column): Column =
    dot(col("embedding"), q) / sqrt(col("nsq") * col("qnsq"))

  /** Brute-force cosine top-10 for probe vec_id=1 over the whole table.
    * orderBy+limit plans as a two-stage top-k (per-partition heap, then
    * driver merge of 10×partitions rows) — no global sort at any scale. */
  def simCosineTopk(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val probe = broadcast(e.filter(col("vec_id") === ProbeId)
      .select(col("embedding").as("q"), col("nsq").as("qnsq")))
    e.crossJoin(probe)
      .filter(col("vec_id") =!= ProbeId)
      .select(col("vec_id"), cosPre(col("q")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** Sign-bit LSH bucketed ANN: candidates share the probe's 4-bit
    * sign bucket (≈1/16 of the table scanned for distance), then cosine
    * top-5 within the bucket. Recall < 1 by design — the scale path. */
  def simLshBucketTopk(s: SparkSession, d: String): DataFrame = {
    val bucketed = emb(s, d)
      .select(col("vec_id"), col("embedding"), col("nsq"),
        signBucket(col("embedding"), 4).as("bucket"))
    val probe = broadcast(bucketed.filter(col("vec_id") === ProbeId)
      .select(col("embedding").as("q"), col("nsq").as("qnsq"),
        col("bucket").as("qbucket")))
    bucketed.join(probe, col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= ProbeId)
      .select(col("vec_id"), col("bucket"), cosPre(col("q")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(5)
  }

  /** IVF with a REAL coarse quantizer (upgrades the sign-bucket and
    * label stand-ins): assign every vector to its nearest of `NCells`
    * centroids by squared L2, probe the query's 2 nearest cells
    * (multi-probe), cosine top-5 within the probed cells only.
    *
    * Centroids are the embeddings of vec_id 1..NCells — a deterministic
    * seed choice so the DuckDB oracle can mirror the assignment
    * bit-for-bit; a production quantizer would train k-means offline
    * and broadcast the trained centroids, THE SAME PLAN SHAPE (the
    * training loop is out-of-band either way).
    *
    * Scale posture: assignment is a narrow crossJoin against NCells
    * broadcast rows folded to an argmin by `min(struct(d2, cid))` —
    * map-side partial aggregation means the only shuffle carries one
    * (vec_id, cell) pair per vector; cell then becomes the partition
    * key and the probe scans cells/NCells of the data. d2 uses the
    * native VecDot/VecNormSq expressions: nsq_v + nsq_c − 2·dot. */
  def simIvfCoarseTopk(s: SparkSession, d: String): DataFrame =
    simIvfCoarseTopkCells(s, d, NCells, NProbe)

  /** Default IVF cell count. SIZING RULE: nCells ≈ sqrt(N) is the
    * classic IVF balance (cell size ≈ N/nCells ≈ sqrt(N) rows scanned
    * per probe); at 100 TB with ~1e9 vectors that's ~32k trained
    * centroids, still a broadcast-sized table (~128 MB at 1k dims).
    * nProbe trades recall for scan fraction (nProbe/nCells of the data).
    * 8/2 suit the fixture (6k vectors → ~750-row cells). */
  private[graft] val NCells = 8
  private[graft] val NProbe = 2

  /** [[simIvfCoarseTopk]] with cell/probe counts as parameters. Unlike
    * the triangle-cell dedup, the RESULT legitimately depends on the
    * quantization (IVF is approximate): more probes monotonically
    * approach the exact brute-force top-k. */
  private[graft] def simIvfCoarseTopkCells(
      s: SparkSession, d: String, nCells: Int, nProbe: Int): DataFrame = {
    require(nCells >= 1 && nProbe >= 1 && nProbe <= nCells,
      s"need 1 <= nProbe <= nCells, got nCells=$nCells nProbe=$nProbe")
    val e = emb(s, d)
    val cents = broadcast(e.filter(col("vec_id") <= nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        col("nsq").as("cnsq")))
    val d2all = e.crossJoin(cents)
      .select(col("vec_id"), col("cid"),
        (col("nsq") + col("cnsq") - lit(2.0) * dot(col("embedding"), col("cemb")))
          .as("d2"))
    val assigned = d2all
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))
    val probeCells = broadcast(d2all.filter(col("vec_id") === ProbeId)
      .orderBy(col("d2"), col("cid")).limit(nProbe) // nCells rows → TakeOrdered, no window
      .select(col("cid").as("pcell")))
    val probe = broadcast(e.filter(col("vec_id") === ProbeId)
      .select(col("embedding").as("q"), col("nsq").as("qnsq")))
    e.join(assigned, "vec_id")
      .join(probeCells, col("cell") === col("pcell"))
      .crossJoin(probe)
      .filter(col("vec_id") =!= ProbeId)
      .select(col("vec_id"), col("cell"), cosPre(col("q")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(5)
  }

  /** PRODUCT QUANTIZATION (Jégou 2011) — the memory-side ANN
    * compression beside the IVF routing side: split each 64-dim vector
    * into M=8 contiguous 8-dim subvectors, quantize each against its
    * subspace's K=4 codebook entries by squared L2, and pack the 8
    * 2-bit codes into one BIGINT — 64 floats → 16 bits/vector, with the
    * quantization error Σ_m d2(m, chosen) carried as the QA column
    * (the countmin/bloom/minhash "sketch + measured error" discipline).
    * Codebooks are the subvectors of vec_id 0..K−1 — the deterministic
    * seed choice [[simIvfCoarseTopk]] uses, so the oracle mirrors the
    * assignment bit-for-bit; production trains per-subspace k-means
    * offline and broadcasts it, same plan shape.
    *
    * Determinism: each subspace distance is nsq+nsq−2·dot over native
    * VecDot/VecNormSq slices (index-order left folds, like every vector
    * query); argmin is `min(struct(d2, cid))`; the error sum is an
    * m-ordered fold. Packing is integer shifts — exact.
    *
    * Scale posture: the M-way explode is a constant ×8 absorbed by the
    * map-side partial `min`; the only shuffles carry (vec, m) argmin
    * rows and the per-vector rollup — both linear in N, never the
    * embeddings themselves against each other. */
  private val PqM = 8; private val PqDsub = 8; private val PqK = 4

  /** m-th subvector slice (m is a column; 1-based slice start). */
  private def pqSub(c: Column): Column =
    slice(c, col("m") * PqDsub + 1, lit(PqDsub))

  /** PQ codebooks: subvectors of vec_id 0..K−1 (codes 0..K−1). */
  private def pqCents(s: SparkSession, d: String): DataFrame =
    broadcast(emb(s, d).filter(col("vec_id") < PqK)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb")))

  /** Per-(vector, subspace) argmin code + its d2 — the shared core of
    * [[simProductQuantization]] (encoding) and [[simIvfPqAdc]] (query
    * via the codes); persisted so a session running both pays the ×M
    * explode once. */
  private def pqBest(s: SparkSession, d: String): DataFrame =
    PipelineCache.getOrPersist(s"sim:pqBest:$d") {
      emb(s, d)
        .select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0), lit(PqM - 1))).as("m"))
        .crossJoin(pqCents(s, d))
        .select(col("vec_id"), col("m"), col("cid"),
          (normSq(pqSub(col("embedding"))) + normSq(pqSub(col("cemb"))) -
            lit(2.0) * dot(pqSub(col("embedding")), pqSub(col("cemb"))))
            .as("d2"))
        .groupBy("vec_id", "m")
        .agg(min(struct(col("d2"), col("cid"))).as("mm"))
        .select(col("vec_id"), col("m"),
          col("mm.cid").as("code"), col("mm.d2").as("d2"))
    }

  def simProductQuantization(s: SparkSession, d: String): DataFrame =
    pqBest(s, d)
      .groupBy("vec_id")
      .agg(sum(expr("shiftleft(code, CAST(2 * m AS INT))")).as("pq_code"),
        aggregate(sort_array(collect_list(struct(col("m"), col("d2")))),
          lit(0.0), (acc, x) => acc + x.getField("d2")).as("recon_err2"))
      .orderBy("vec_id")

  /** ADC QUERY over the PQ index (the second half of IVFADC, Jégou
    * 2011): the probe precomputes a 8×4 DISTANCE TABLE (its subvector
    * vs every codebook entry — M·K subspace distances, broadcast), and
    * every database vector's approximate squared distance is then just
    * Σ_m dtable(m, code_m(x)) — a table LOOKUP join on (m, code) plus
    * an m-ordered fold, touching only the 2-bit codes, never the
    * floats. Exact ‖x−q‖² rides along as the approximation audit
    * (recall_eval discipline: rank-by-ADC vs rank-by-exact).
    *
    * Scale posture: the distance table is M·K rows (32 here; 2 KB at
    * production M=16, K=256) broadcast once per query batch; the scan
    * side touches codes only — the plan reads 16 bits where the exact
    * query reads 256 bytes. One partial-aggregated rollup per vector,
    * one TakeOrdered top-k. */
  def simIvfPqAdc(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val probe = e.filter(col("vec_id") === ProbeId)
    val dtable = broadcast(probe
      .select(explode(sequence(lit(0), lit(PqM - 1))).as("m"),
        col("embedding").as("q"))
      .crossJoin(pqCents(s, d))
      .select(col("m"), col("cid").as("code"),
        (normSq(pqSub(col("q"))) + normSq(pqSub(col("cemb"))) -
          lit(2.0) * dot(pqSub(col("q")), pqSub(col("cemb")))).as("dq")))
    val exact = e.crossJoin(broadcast(probe.select(col("embedding").as("q"),
        col("nsq").as("qnsq"))))
      .select(col("vec_id"),
        (col("nsq") + col("qnsq") - lit(2.0) * dot(col("embedding"), col("q")))
          .as("exact_d2"))
    pqBest(s, d)
      .join(dtable, Seq("m", "code"))
      .groupBy("vec_id")
      .agg(aggregate(sort_array(collect_list(struct(col("m"), col("dq")))),
        lit(0.0), (acc, x) => acc + x.getField("dq")).as("adc_d2"))
      .join(exact, "vec_id")
      .filter(col("vec_id") =!= ProbeId)
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(10)
  }

  /** Per-label 3-nearest-neighbor lists: two-stage top-k via window
    * rank inside each label block — the grouped-ANN shape (one shuffle
    * on label, rank inside partitions; no global sort). */
  def simKnnPerLabel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, d)
    val probe = broadcast(e.filter(col("vec_id") === ProbeId)
      .select(col("embedding").as("q"), col("nsq").as("qnsq")))
    val scored = e.crossJoin(probe)
      .filter(col("vec_id") =!= ProbeId)
      .select(col("label"), col("vec_id"), cosPre(col("q")).as("cos"))
    val w = Window.partitionBy("label").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("label"), col("rk"), col("vec_id"), col("cos"))
      .orderBy("label", "rk")
  }

  /** One k-means TRAINING iteration: assign every vector to its nearest
    * seed centroid (the IVF assignment), then recompute each centroid
    * dimension as the mean of its members.
    *
    * The mean is the PRODUCTION form — a plain partial-aggregated
    * `sum(x)/n` (map-side combine, constant-width aggregation rows; a
    * mega-cell costs nothing extra). Cross-engine float agreement is
    * handled by rounding the centroid to 12 decimals on both sides:
    * sum-order drift between engines is ~1e−16 relative vs 5e−13
    * rounding granularity — verified at all three fixture scales. The
    * bit-stable ordered-fold formulation (members collected and folded
    * in vec_id order — per-group lists, NOT a 100 TB plan) survives as
    * [[simKmeansStepFold]] purely as the differential-spec bridge.
    *
    * Scale posture: posexplode fans each vector to 64 (cell, dim) rows;
    * the groupBy shuffles one row per (vector, dim) partial-aggregated
    * down to k·d cells ≈ 512 groups — the reduce side is trivial. */
  def simKmeansStep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val e = emb(s, d)
    val cents = broadcast(e.filter(col("vec_id") <= NCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        col("nsq").as("cnsq")))
    val assigned = e.crossJoin(cents)
      .select(col("vec_id"), col("cid"),
        (col("nsq") + col("cnsq") - lit(2.0) * dot(col("embedding"), col("cemb")))
          .as("d2"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))
    e.join(assigned, "vec_id")
      .select(col("vec_id"), col("cell"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), (col("pos") + 1).cast(LongType).as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast(DoubleType)).as("sx"))
      .select(col("cell"), col("dim"),
        round(col("sx") / col("n").cast(DoubleType), 12).as("centroid"),
        col("n"))
      .orderBy("cell", "dim")
  }

  /** Ordered-fold (bit-stable) formulation of [[simKmeansStep]],
    * UNREGISTERED: kept only as the deterministic reference the
    * differential spec compares the production `sum` against. */
  private[graft] def simKmeansStepFold(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val e = emb(s, d)
    val cents = broadcast(e.filter(col("vec_id") <= NCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        col("nsq").as("cnsq")))
    val assigned = e.crossJoin(cents)
      .select(col("vec_id"), col("cid"),
        (col("nsq") + col("cnsq") - lit(2.0) * dot(col("embedding"), col("cemb")))
          .as("d2"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))
    e.join(assigned, "vec_id")
      .select(col("vec_id"), col("cell"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), (col("pos") + 1).cast(LongType).as("dim"))
      .agg(count(lit(1)).as("n"),
        aggregate(
          transform(array_sort(collect_list(struct(col("vec_id"), col("x")))),
            m => m.getField("x").cast(DoubleType)),
          lit(0.0), (acc, v) => acc + v).as("sx"))
      .select(col("cell"), col("dim"),
        (col("sx") / col("n").cast(DoubleType)).as("centroid"), col("n"))
      .orderBy("cell", "dim")
  }

  /** Scalar int8 quantization of the embedding column — the storage
    * path a 100 TB vector store actually ships (4× smaller than f32):
    * clamp to [-1, 1], scale by 127, round half-away-from-zero. Output
    * is per-vector scalars only (exact integer checksum of the codes +
    * IEEE-exact reconstruction error), no list columns — the driver's
    * row-sort gate cannot hold arrays. Pure per-row projection: zero
    * shuffle at any scale. */
  def simQuantizeInt8(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val xd = transform(col("embedding"), x => x.cast(DoubleType))
    val q = transform(xd, x =>
      round(greatest(lit(-1.0), least(lit(1.0), x)) * lit(127.0))
        .cast(IntegerType))
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), xd.as("xd"), q.as("q"))
      .select(col("vec_id"), col("label"),
        size(col("q")).as("n_dims"),
        size(filter(col("xd"), x => abs(x) > lit(1.0))).as("n_clipped"),
        aggregate(col("q"), lit(0L), (acc, v) => acc + v.cast(LongType))
          .as("q_sum"),
        aggregate(
          zip_with(col("xd"), col("q"), (a, b) =>
            (a - b.cast(DoubleType) / lit(127.0)) *
              (a - b.cast(DoubleType) / lit(127.0))),
          lit(0.0), (acc, v) => acc + v).as("l2_err"))
      .orderBy("vec_id")
  }

  /** ANN QUALITY EVALUATION — the measurement that decides whether an
    * approximate index is shippable: recall@5 of the IVF(8,2) search
    * against exact brute-force top-5, over a panel of 10 probe vectors
    * (vec_id 11–20, disjoint from the centroid seeds). recall = |IVF
    * top-5 ∩ exact top-5| / 5 per probe.
    *
    * Scale posture: the probe panel is a broadcast frame, so the scored
    * cross product is a single pass over the table fanned ×10 (probes ×
    * corpus, never corpus × corpus); it is computed ONCE (persisted) and
    * reused by both arms, so the eval costs one scan + two windowed
    * top-ks + a pair-counting join on (pid, vec_id). At 100 TB the
    * panel would be a held-out query sample — same plan. Both arms use
    * identical tie-breaks (cos DESC, vec_id), so the compared sets are
    * deterministic in both engines. */
  def simAnnRecallEval(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    val e = emb(s, d)
    val probes = broadcast(e.filter(col("vec_id").between(11, 20))
      .select(col("vec_id").as("pid"), col("embedding").as("q"),
        col("nsq").as("qnsq")))
    val scored = PipelineCache.getOrPersist(s"sim:recallScored:$d")(
      e.crossJoin(probes).filter(col("vec_id") =!= col("pid"))
        .select(col("pid"), col("vec_id"), cosPre(col("q")).as("cos")))
    val wp = Window.partitionBy("pid").orderBy(col("cos").desc, col("vec_id"))
    val exact = scored.withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= 5).select("pid", "vec_id")
    val cents = broadcast(e.filter(col("vec_id") <= NCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        col("nsq").as("cnsq")))
    val d2all = e.crossJoin(cents)
      .select(col("vec_id"), col("cid"),
        (col("nsq") + col("cnsq") - lit(2.0) * dot(col("embedding"), col("cemb")))
          .as("d2"))
    val assigned = d2all.groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))
    val wq = Window.partitionBy("pid").orderBy(col("d2"), col("cid"))
    val probeCells = broadcast(d2all.filter(col("vec_id").between(11, 20))
      .select(col("vec_id").as("pid"), col("cid"), col("d2"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= NProbe)
      .select(col("pid").as("cpid"), col("cid").as("pcell")))
    val approx = scored.join(assigned, "vec_id")
      .join(probeCells,
        col("pid") === col("cpid") && col("cell") === col("pcell"))
      .withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= 5).select("pid", "vec_id")
    val hits = exact.join(approx, Seq("pid", "vec_id"))
      .groupBy("pid").agg(count(lit(1)).as("n_hit"))
    probes.select("pid").join(hits, Seq("pid"), "left")
      .select(col("pid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall", col("n_hit").cast(DoubleType) / lit(5.0))
      .orderBy("pid")
  }

  /** IVF-PQ RECALL EVALUATION — the shippability measurement for the
    * COMPRESSED index ([[simAnnRecallEval]] measures the IVF routing;
    * this measures what 2-bit ADC quantization costs): recall@10 of
    * rank-by-ADC against exact L2 top-10, over the same 10-probe panel
    * (vec_id 11–20, disjoint from the PQ codebook seeds 0–3). Low
    * recall here tells an operator to raise K/M or add an exact rerank
    * stage BEFORE shipping the index — the number that gates every
    * production PQ deployment.
    *
    * Scale posture: the per-probe distance tables are 10·M·K rows
    * broadcast once; the ADC arm touches only the persisted code frame
    * ([[pqBest]], shared with the encode/query ops); both arms rank
    * with identical tie-breaks (distance, vec_id), so the compared
    * sets are deterministic in both engines. */
  def simAnnIvfpqRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    val e = emb(s, d)
    val probes = broadcast(e.filter(col("vec_id").between(11, 20))
      .select(col("vec_id").as("pid"), col("embedding").as("q"),
        col("nsq").as("qnsq")))
    val exactScored = e.crossJoin(probes).filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        (col("nsq") + col("qnsq") - lit(2.0) * dot(col("embedding"), col("q")))
          .as("d2"))
    val we = Window.partitionBy("pid").orderBy(col("d2"), col("vec_id"))
    val exact = exactScored.withColumn("rk", row_number().over(we))
      .filter(col("rk") <= 10).select("pid", "vec_id")
    val dtable = broadcast(probes
      .select(col("pid"), explode(sequence(lit(0), lit(PqM - 1))).as("m"),
        col("q"))
      .crossJoin(pqCents(s, d))
      .select(col("pid"), col("m"), col("cid").as("code"),
        (normSq(pqSub(col("q"))) + normSq(pqSub(col("cemb"))) -
          lit(2.0) * dot(pqSub(col("q")), pqSub(col("cemb")))).as("dq")))
    val adc = pqBest(s, d)
      .join(dtable, Seq("m", "code"))
      .groupBy("pid", "vec_id")
      .agg(aggregate(sort_array(collect_list(struct(col("m"), col("dq")))),
        lit(0.0), (acc, x) => acc + x.getField("dq")).as("adc_d2"))
      .filter(col("vec_id") =!= col("pid"))
    val wa = Window.partitionBy("pid").orderBy(col("adc_d2"), col("vec_id"))
    val approx = adc.withColumn("rk", row_number().over(wa))
      .filter(col("rk") <= 10).select("pid", "vec_id")
    val hits = exact.join(approx, Seq("pid", "vec_id"))
      .groupBy("pid").agg(count(lit(1)).as("n_hit"))
    probes.select("pid").join(hits, Seq("pid"), "left")
      .select(col("pid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall_at_10", col("n_hit").cast(DoubleType) / lit(10.0))
      .orderBy("pid")
  }

  /** SemDeDup cell-count FLOOR. SIZING RULE (implemented, not just
    * documented — the r10 knn-IVF lesson): with argmin assignment
    * against the first-nCells seed centroids, cost has TWO terms —
    * assignment N·nCells and the intra-cell pair join Σcell² ≈
    * N²/nCells. A constant nCells leaves the pair join quadratic; a
    * linear nCells = N/c leaves the ASSIGNMENT quadratic (N²/c). The
    * balanced optimum is the same sqrt rule as [[simKnnBatchIvf]]:
    * nCells = max(64, ⌈√N⌉) makes BOTH terms N^1.5. Derived from a
    * distributed 1-row count broadcast and mirrored verbatim in the
    * DuckDB oracle CTE. At ~1e9 vectors a production run replaces the
    * seed-argmin with a trained hierarchical quantizer (assignment
    * sublinear in nCells), which is a constant-factor swap on this
    * same plan shape. The floor 64 keeps the fixture scales (≤4,096
    * vectors) on the original 64 seed centroids. */
  private[graft] val SemCellsFloor = 64
  private[graft] val SemTau = 0.35

  /** Coarse argmin assignment shared by [[dedupSemanticCells]] and
    * [[simKnnBatchIvf]] (they differ only in the cell-count floor):
    * nCells = max(floor, ⌈√N⌉) seed centroids (first-nCells vec_ids —
    * deterministic, oracle-mirrorable), bit-stable `min(struct(d2,
    * cid))` argmin, output one (vec_id, cell, embedding, nsq) row per
    * vector. The 1-row count broadcast keeps the derivation distributed
    * (no driver collect). */
  private[graft] def coarseAssigned(s: SparkSession, d: String,
                                    ncFloor: Long): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val e = emb(s, d)
    val nc = e.agg(greatest(lit(ncFloor),
      ceil(sqrt(count(lit(1)))).cast(LongType)).as("nc"))
    val cents = broadcast(e.crossJoin(broadcast(nc))
      .filter(col("vec_id") <= col("nc"))
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        col("nsq").as("cnsq")))
    val assigned = e.crossJoin(cents)
      .select(col("vec_id"), col("cid"),
        (col("nsq") + col("cnsq") - lit(2.0) * dot(col("embedding"), col("cemb")))
          .as("d2"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))
    e.join(assigned, "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"), col("nsq"))
  }

  /** Per-COARSE-CELL sub-cell count frame — the round-13 per-label
    * triangle-cell machinery ([[graft.ops.DedupQueries.embedCellFrame]])
    * applied with the quantizer cell in place of the label (r13 verdict
    * #2): m(cell) = max(floor, ⌈cell rows / target⌉) from a cheap
    * `groupBy(cell).count()` pre-pass, broadcast into the replication
    * step. The √N sizing rule bounds EXPECTED cell size, not the
    * hottest cell — a boilerplate embedding cluster (every near-blank
    * page quantizing to one centroid) still concentrates, and without
    * this frame that one cell's pair join is quadratic in the hot-cell
    * count. Pairs share a cell ⇒ share an m, so the cell-pair cover
    * proof carries over verbatim and the pair set is m-invariant
    * (spec-pinned, same as the per-label form). */
  private[graft] def cellMFrame(assigned: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    // Floor 1, not the per-label form's 4 (round 14, measured): coarse
    // cells are already ≈√N-sized by the quantizer, so at small scale
    // every cell sits far under [[DedupQueries.EmbedCellTargetRows]]
    // and a floor-4 m only REPLICATES each row 4× through the pair
    // join for zero skew protection it doesn't already have — m still
    // grows with ceil(cell/target), so a hot cell keeps the
    // (2·target)² task bound. Pair set is m-invariant for any m ≥ 1
    // (DedupSimilaritySpec pins m ∈ {1, 4, 5, 7, skewed} identical);
    // measured 1.27 s → ~0.6 s (dedup_semantic_cells) and 2.2 →
    // ~1.3 s (sim_knn_batch_ivf) at sf0.1 with oracle hashes
    // unchanged.
    assigned.groupBy(col("cell")).count()
      .select(col("cell"), greatest(lit(1L),
        ceil(col("count").cast(DoubleType) /
          lit(DedupQueries.EmbedCellTargetRows.toDouble)).cast(LongType)).as("m"))
  }

  /** Triangle sub-cell replication within coarse cells: sub-cell
    * sc = vec_id mod m(cell), each row replicated to the m unordered
    * sub-cell pairs it can meet a partner in. Input must carry an `m`
    * column (broadcast-joined [[cellMFrame]] in the shipped queries; a
    * literal in the specs' parameterized form). */
  private[graft] def cellReplicate(withM: DataFrame): DataFrame =
    withM
      .select(col("cell"), col("vec_id"), col("embedding"), col("nsq"),
        pmod(col("vec_id"), col("m")).as("sc"), col("m"))
      .select(col("*"), explode(sequence(lit(0L), col("m") - lit(1L))).as("other"))
      .select(col("cell"), col("vec_id"), col("embedding"), col("nsq"), col("sc"),
        least(col("sc"), col("other")).as("lo"),
        greatest(col("sc"), col("other")).as("hi"))

  /** Exact unordered within-cell pairs over a replicated base:
    * compound-key equi-join on (cell, lo, hi); the least/greatest guard
    * keeps each pair in exactly one sub-cell pair, so the output equals
    * the naive within-cell self-join for ANY m while the biggest task
    * shrinks from O(hottest cell)² to O(2·cell/m)² ≈ (2·target)². */
  private[graft] def cellPairs(rep: DataFrame): DataFrame =
    rep.as("a").join(rep.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.lo") === col("b.lo") && col("a.hi") === col("b.hi") &&
          col("a.vec_id") < col("b.vec_id") &&
          least(col("a.sc"), col("b.sc")) === col("a.lo") &&
          greatest(col("a.sc"), col("b.sc")) === col("a.hi"))
      .select(col("a.cell").as("cell"),
        col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (dot(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nsq") * col("b.nsq"))).as("cos"))

  /** SEMANTIC dedup (the SemDeDup recipe): cluster embeddings around
    * coarse centroids, then call any intra-cell pair with cosine ≥ τ a
    * duplicate. APPROXIMATE by design — cross-cell near-dups are missed
    * (that's the recall/cost trade; `dedup_embedding_cosine` is the
    * exact in-label variant) but the pair join is bounded to cells, so
    * cost is Σ|cell|²/2 ≈ N·targetCellSize/2, LINEAR in N under the
    * sizing rule — the property that lets this run at 100 TB where the
    * exact all-pairs quadratic cannot.
    *
    * Centroids are the first max([[SemCellsFloor]], ⌈√N⌉) vectors
    * (deterministic seed, same rationale as the IVF quantizer above);
    * assignment is the same bit-stable argmin. Round 14 (r13 verdict
    * #2): the intra-cell join rides the triangle sub-cell machinery
    * ([[cellMFrame]]/[[cellReplicate]]/[[cellPairs]]), so a HOT cell —
    * the balanced-cells assumption's failure mode — splits into
    * bounded sub-cell-pair tasks with the pair set unchanged. Output:
    * intra-cell near-dup pairs + the cell. */
  def dedupSemanticCells(s: SparkSession, d: String): DataFrame = {
    val assigned = coarseAssigned(s, d, SemCellsFloor.toLong)
    val rep = cellReplicate(assigned.join(broadcast(cellMFrame(assigned)), "cell"))
    cellPairs(rep)
      .filter(col("cos") >= SemTau)
      .orderBy("a_id", "b_id")
  }

  /** Embedding dimensionality of the fixture corpus (checked at run
    * time — the deterministic v0 literal below is built for it). */
  private val Dim = 64

  /** One PCA POWER-ITERATION step — the dominant-eigenvector primitive
    * behind embedding whitening/compression: w = Σᵢ xᵢ·(xᵢ·v₀) (the
    * Gram matvec; centering is one additional mean-subtraction pass,
    * same shape), with v₀ a fixed deterministic probe direction.
    *
    * Determinism recipe — the FIXED-POINT SUPERACCUMULATOR (how
    * reproducible distributed reductions are actually built): each
    * per-row score xᵢ·v₀ is the index-order dot (bit-stable); each
    * per-dim term is scaled by 2³² (an exponent shift — EXACT on any
    * IEEE engine) and floored to an integer, and the big sum runs in
    * exact integer arithmetic — ORDER-INSENSITIVE, so it's a plain
    * partial-aggregated `sum()` with no collect_list and no per-group
    * ordered reduction (the kmeans step's fold) and no double→decimal
    * cast (whose rounding DuckDB does differently than the JVM —
    * measured). w is reproduced to 2⁻³² absolute; headroom: |term|·2³²
    * ≤ ~4e12 per row, so a 2⁶³ accumulator holds ~2M rows/group before
    * a production run widens to a 128-bit or two-level accumulator.
    *
    * Scale posture: cost is one pass + one shuffle of N·d narrow
    * integer rows; iterate K times for convergence with the same plan
    * (K ≈ 10–30 for a separated spectrum), normalizing between rounds. */
  def simPcaPowerIter(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val Scale = 4294967296.0 // 2^32
    val v0 = typedLit(Seq.tabulate(Dim)(j => ((j % 5) - 2).toFloat))
    val e = Tables.embeddings(s, d)
    val scored = e
      .filter(size(col("embedding")) === Dim)
      .select(col("vec_id"), col("embedding"),
        dot(col("embedding"), v0).as("sc"))
    scored
      .select(col("sc"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast(LongType).as("dim"),
        floor(col("x").cast(DoubleType) * col("sc") * lit(Scale)).as("term"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        (sum(col("term")).cast(DoubleType) / lit(Scale)).as("w"))
      .orderBy("dim")
  }

  /** Batch kNN self-join (IVF-celled) — EVERY vector's top-3 cosine
    * neighbors within its coarse cell, the all-rows counterpart of the
    * single-probe queries: the shape of hard-negative mining and
    * "nearest duplicate" report generation, where the query set IS the
    * corpus. Approximate by construction (cross-cell neighbors are
    * missed — the IVF recall trade, measured by `sim_ann_recall_eval`).
    *
    * Scale posture: the pair join is an equi-join on the cell id, so
    * pair count is Σ cell² ≈ N²/nCells — and nCells here IS sized by
    * the sqrt rule, nCells = max(8, ⌈√N⌉), derived from a DISTRIBUTED
    * count (1-row aggregate broadcast into the centroid filter — no
    * driver collect), so the pair join is N^1.5 dot products at every
    * scale, vs N² brute force: 500 rows → 23 cells, 200k (sf10) → 448,
    * 1e9 → ~32k (centroids still a broadcast-sized table). At 1e9 a
    * production run additionally caps the per-cell candidate list
    * (IVF-PQ or a per-cell pre-rank) before the exact distance; the
    * ⌈√N⌉ arithmetic is mirrored verbatim in the DuckDB oracle, which
    * keeps the approximate answer engine-identical. The top-3 rank is
    * a window INSIDE the same cell partitioning — the q_id window
    * repartitions only (q, neighbor, cos) triples, never embeddings.
    *
    * Round 14 (r13 verdict #2): the within-cell pair join rides the
    * triangle sub-cell machinery ([[cellMFrame]] / [[cellReplicate]] /
    * [[cellPairs]]) — √N sizing bounds the EXPECTED cell, not the
    * hottest one, and a boilerplate cluster quantizing to one centroid
    * previously owned a quadratic task. Sub-cells bound every task at
    * ≈ (2·target)² with the pair set unchanged. The kNN join needs
    * ORDERED pairs (every q sees all its neighbors): the unordered
    * cell-pair output is mirrored into both directions, which is the
    * same pair multiset the old a≠b join produced — and the same total
    * dot-product count, split across two union branches. */
  def simKnnBatchIvf(s: SparkSession, d: String): DataFrame = {
    val full = PipelineCache.getOrPersist(s"sim:knnBatchCells:$d")(
      coarseAssigned(s, d, 8L))
    val rep = cellReplicate(full.join(broadcast(cellMFrame(full)), "cell"))
    val und = cellPairs(rep)
    val pairs = und
      .select(col("a_id").as("q_id"), col("b_id").as("nbr_id"), col("cos"))
      .unionAll(und
        .select(col("b_id").as("q_id"), col("a_id").as("nbr_id"), col("cos")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id"))
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("rk"), col("nbr_id"), col("cos"))
      .orderBy("q_id", "rk")
  }

  /** ±1 component (p, j) of SRP hyperplane p: parity of a fixed LCG
    * step — deterministic and engine-portable (the oracle embeds the
    * same literal vectors). Dense ±1 planes are the standard cheap SRP
    * family (Charikar '02 hyperplane rounding; Achlioptas-style ±1
    * entries keep the projection exact integer-weighted double math —
    * no gaussian RNG needed). */
  private[graft] def srpSign(p: Int, j: Int): Double = {
    val x = p.toLong * Dim + j
    if (((x * 1103515245L + 12345L) / 65536L) % 2L == 1L) 1.0 else -1.0
  }
  private val SrpTau = 0.35

  /** Embedding near-dup via SIGNED RANDOM PROJECTIONS — the cosine-LSH
    * counterpart of the token-side minhash/simhash family: 16 fixed ±1
    * hyperplanes → 16 sign bits → two 8-bit band keys; candidates share
    * a band (equi-join), then the exact cosine verifies at τ=0.35.
    * Unlike [[dedupSemanticCells]] (which needs a label/quantizer), SRP
    * needs NO trained structure — the go-to first pass on an unlabeled
    * embedding corpus.
    *
    * Scale posture: per-row signature work is 16 codegen'd [[dot]]s
    * against LITERAL sign vectors (no broadcast, folded into the
    * projection); the candidate join carries (vec_id, band, key)
    * triples — never embeddings — and random collisions bound fan-out
    * at N²/2⁸ per band (tune bits-per-band to corpus size exactly like
    * the minhash band arithmetic). Recall at τ follows the SRP collision
    * law P = 1 − θ/π per bit; production stacks more bands for recall —
    * same plan, more union branches (measure with `sim_ann_recall_eval`'s
    * harness). Verify joins rehydrate embeddings by vec_id — the
    * candidate set is ~N·k rows, so the rehydration is two hash joins on
    * the id, not an embedding shuffle. */
  def dedupSrpLsh(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    def proj(p: Int): Column =
      dot(col("embedding"), typedLit(Seq.tabulate(Dim)(srpSign(p, _))))
    def band(lo: Int): Column =
      (lo until lo + 8).map(p =>
        when(proj(p) >= 0.0, lit(1 << (p - lo))).otherwise(lit(0))).reduce(_ + _)
    val sig = PipelineCache.getOrPersist(s"sim:srpSig:$d")(
      e.filter(size(col("embedding")) === Dim)
        .select(col("vec_id"), col("embedding"), col("nsq"),
          band(0).as("b0"), band(8).as("b1")))
    val bands = sig.select(col("vec_id"), explode(array(
        struct(lit(0).as("b"), col("b0").as("k")),
        struct(lit(1).as("b"), col("b1").as("k")))).as("bk"))
      .select(col("vec_id"), col("bk.b").as("b"), col("bk.k").as("k"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct()
    cand
      .join(sig.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
        col("nsq").as("na")), "a_id")
      .join(sig.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("nsq").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (dot(col("ea"), col("eb")) / sqrt(col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= SrpTau)
      .orderBy("a_id", "b_id")
  }

  /** BINARY-HAMMING search — the third compression rung of the ANN
    * family ladder (float32 → int8 [[simQuantizeInt8]] → PQ codes
    * [[simProductQuantization]] → 1 bit/dim here): binarize each
    * embedding to its 64 sign bits packed into two 32-bit halves, rank
    * by Hamming distance popcount(xor) to the probe's code — 8 bytes a
    * vector, distance = two XORs + two popcounts, the memory-bandwidth-
    * bound regime where binary codes beat everything else at 1e9+
    * vectors. The exact cosine rides along per row, so the output
    * doubles as the rerank input AND the approximation audit (how well
    * does 64-bit Hamming track cosine — the recall_eval discipline).
    *
    * Exactness: sign-bit packing, XOR, and popcount are pure integer
    * ops — bit-identical by construction; two 32-bit halves avoid the
    * 1<<63 sign-bit overflow divergence between engines. The only FP is
    * the audit cosine (the standard index-order fold).
    *
    * Scale posture: codes are one projection over the scan (no
    * broadcast, no shuffle); the probe comparison is a 1-row broadcast
    * and a TakeOrdered top-k — never a global sort. At 1e9 vectors the
    * same plan scans 8 GB of codes instead of 256 GB of floats. */
  def simBinaryHammingTopk(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    def half(lo: Int): Column =
      (lo until lo + 32).map(i =>
        when(element_at(col("embedding"), i + 1) >= 0, lit(1L << (i - lo)))
          .otherwise(lit(0L))).reduce(_ + _)
    val sig = e.select(col("vec_id"), col("embedding"), col("nsq"),
      half(0).as("h0"), half(32).as("h1"))
    val probe = broadcast(sig.filter(col("vec_id") === ProbeId)
      .select(col("embedding").as("q"), col("nsq").as("qnsq"),
        col("h0").as("p0"), col("h1").as("p1")))
    sig.crossJoin(probe).filter(col("vec_id") =!= ProbeId)
      .select(col("vec_id"),
        (bit_count(col("h0").bitwiseXOR(col("p0"))) +
          bit_count(col("h1").bitwiseXOR(col("p1")))).as("hamming"),
        cosPre(col("q")).as("cos"))
      .orderBy(col("hamming"), col("vec_id"))
      .limit(10)
  }

  /** HYBRID RETRIEVAL with RECIPROCAL-RANK FUSION — the two-tower
    * search stack in one plan: a lexical ranker (distinct-token Jaccard
    * against each probe document) and a vector ranker (embedding cosine
    * against the probe's embedding — doc_id and vec_id are the same key
    * space by fixture contract) each produce a per-probe top-20, and
    * RRF fuses them: score = Σ 1/(60+rank) over the modalities that
    * retrieved the candidate (the rank-only fusion of Cormack et al. —
    * no score calibration between incomparable metrics needed, which is
    * exactly why production hybrid search uses it). Ranks are integers,
    * so the two reciprocal terms and their one addition are the
    * identical IEEE doubles in both engines; all orderings carry doc_id
    * tiebreaks.
    *
    * Scale posture: probes are a broadcast ≤3-row side on BOTH towers —
    * each tower is ONE corpus scan with per-row codegen'd scoring (the
    * [[dot]] native expression; set intersection on pre-distinct token
    * arrays), a per-probe top-k window, then the fusion join runs on
    * two ≤probes·20-row frames — negligible next to the scans. At real
    * scale the towers swap in their indexed forms ([[simIvfCoarseTopk]]
    * / minhash-LSH blocking) — the fusion stage is unchanged, which is
    * the point of rank-only fusion. */
  def simHybridRrf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val nProbes = 3; val topM = 20; val topOut = 5
    val toks = Tables.documents(s, d).select(col("doc_id"),
      array_distinct(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
    val probeT = broadcast(toks.filter(col("doc_id") < nProbes)
      .select(col("doc_id").as("probe_id"), col("tok").as("ptok")))
    val inter = size(array_intersect(col("tok"), col("ptok")))
    val lex = toks.crossJoin(probeT)
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"), col("doc_id"), inter.as("i"),
        size(col("tok")).as("na"), size(col("ptok")).as("nb"))
      .filter(col("i") > 0)
      .select(col("probe_id"), col("doc_id"),
        (col("i").cast(DoubleType) /
          (col("na") + col("nb") - col("i")).cast(DoubleType)).as("jacc"))
    val lexTop = lex.withColumn("lex_rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("jacc").desc, col("doc_id")))
        .cast(LongType))
      .filter(col("lex_rank") <= topM)
      .select("probe_id", "doc_id", "lex_rank")
    val e = emb(s, d)
    val probeV = broadcast(e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"),
        col("nsq").as("pnsq")))
    val vec = e.crossJoin(probeV)
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("doc_id"),
        (dot(col("embedding"), col("pemb")) /
          sqrt(col("nsq") * col("pnsq"))).as("cos"))
    val vecTop = vec.withColumn("vec_rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cos").desc, col("doc_id")))
        .cast(LongType))
      .filter(col("vec_rank") <= topM)
      .select("probe_id", "doc_id", "vec_rank")
    val fused = lexTop.join(vecTop, Seq("probe_id", "doc_id"), "full_outer")
      .select(col("probe_id"), col("doc_id"), col("lex_rank"), col("vec_rank"),
        (coalesce(lit(1.0) / (col("lex_rank") + 60), lit(0.0)) +
          coalesce(lit(1.0) / (col("vec_rank") + 60), lit(0.0))).as("rrf"))
    fused.withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("rrf").desc, col("doc_id")))
        .cast(LongType))
      .filter(col("rk") <= topOut)
      .select("probe_id", "doc_id", "rk", "rrf", "lex_rank", "vec_rank")
      .orderBy("probe_id", "rk")
  }

  /** MATRYOSHKA two-stage ANN — the MRL trick (Kusupati et al. '22:
    * nested-prefix embeddings): a COARSE pass scores only the first 16
    * dimensions (4× less arithmetic and 4× less memory traffic per
    * candidate), keeps the top-50 by prefix cosine, and the exact
    * full-dimension cosine reranks just those 50 to the final top-10.
    * Both stages are `orderBy+limit` → TakeOrderedAndProject
    * (per-partition heaps + driver merge of k·partitions rows — no
    * global sort at any scale); full tiebreaks on vec_id.
    *
    * Scale posture: the corpus-wide pass touches 16 of 64 floats per
    * row — on a 100 TB embedding store that is the difference between
    * scanning 25 TB and 100 TB IF the head is stored as its own column
    * (parquet column pruning; here the slice happens post-read, the
    * plan shape is what carries over). Rerank cost is 50 rows — free.
    * Recall is a fixture-measured property (spec), not a guess: prefix
    * cosine ordering approximates full ordering exactly as well as the
    * embedding family's MRL property holds. */
  def simMatryoshkaTopk(s: SparkSession, d: String): DataFrame = {
    val coarseDim = 16
    val e = emb(s, d)
    val probe = broadcast(e.filter(col("vec_id") === ProbeId)
      .select(col("embedding").as("q"), col("nsq").as("qnsq"),
        slice(col("embedding"), 1, coarseDim).as("qhead")))
    val coarse = e.crossJoin(probe)
      .filter(col("vec_id") =!= ProbeId)
      .withColumn("head", slice(col("embedding"), 1, coarseDim))
      .withColumn("coarse_cos", dot(col("head"), col("qhead")) /
        sqrt(normSq(col("head")) * normSq(col("qhead"))))
      .orderBy(col("coarse_cos").desc, col("vec_id"))
      .limit(50)
    coarse
      .withColumn("cos", dot(col("embedding"), col("q")) /
        sqrt(col("nsq") * col("qnsq")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("coarse_cos"), col("cos"))
  }

  /** MAXIMUM INNER PRODUCT top-10 via the norm-augmentation reduction
    * (Bachrach et al. 2014): append sqrt(M² − ‖x‖²) to every data
    * vector (M = max norm) and 0 to the query, and nearest-neighbor in
    * augmented L2 becomes MIPS — aug_l2sq = M² + ‖q‖² − 2·⟨x,q⟩ is
    * monotone DECREASING in the inner product, so an L2-based ANN index
    * (the IVF cells above) serves inner-product retrieval unchanged.
    * This is the retrieval objective for IP-trained embedding models
    * (the cosine queries assume normalized training). Output carries
    * both the raw inner product and the augmented distance; the ranking
    * equivalence is spec-asserted against plain dot ordering.
    *
    * Determinism: dot/norms are the index-order folds; M² is a MAX
    * selection (exact); the remaining ops are one subtraction chain of
    * exact-operand IEEE doubles — bit-identical cross-engine.
    *
    * Scale posture: same as [[simCosineTopk]] — probe and the 1-row max
    * broadcast, TakeOrdered top-k, corpus never shuffled. */
  def simMipsAugmented(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val m2 = broadcast(e.agg(max(col("nsq")).as("m2")))
    val probe = broadcast(e.filter(col("vec_id") === ProbeId)
      .select(col("embedding").as("q"), col("nsq").as("qnsq")))
    e.crossJoin(m2).crossJoin(probe)
      .filter(col("vec_id") =!= ProbeId)
      .select(col("vec_id"),
        dot(col("embedding"), col("q")).as("ip"),
        (col("m2") + col("qnsq") -
          lit(2.0) * dot(col("embedding"), col("q"))).as("aug_l2sq"))
      .orderBy(col("aug_l2sq"), col("vec_id"))
      .limit(10)
  }


  /** SIMPLIFIED SILHOUETTE per label — the clustering-quality readout
    * (how separable the label structure is in embedding space) that
    * gates cluster-based curation: a(i) = distance to the OWN label's
    * centroid, b(i) = distance to the nearest OTHER centroid,
    * s(i) = (b−a)/max(a,b); report each label's mean. The "simplified"
    * variant (centroid distances, not all-pairs) is the one that scales
    * — O(N·K) instead of O(N²).
    *
    * Determinism: centroid coordinates use the [[simKmeansStep]] recipe
    * (double sum / count, round 12 — differential-pinned against the
    * ordered fold); every distance is an index-ordered squared-diff
    * fold (the dotFold convention); the per-label mean folds in vec_id
    * order; round 9. Scale posture: centroid build is one partial-agg
    * (label, dim) shuffle; the N×K distance pass broadcasts the K-row
    * centroid frame; the rollup is K groups. */
  def simSilhouette(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val centDims = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).cast(LongType).as("dim"))
      .agg(round(sum(col("v").cast(DoubleType)) /
        count(lit(1)).cast(DoubleType), 12).as("c"))
    val cents = centDims.groupBy(col("label").as("clabel"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x("c")).as("cemb"))
    def sqdistFold(a: Column, b: Column) =
      aggregate(zip_with(a, b,
          (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
        lit(0.0), (acc, v) => acc + v)
    val ab = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("clabel"),
        sqdistFold(col("embedding"), col("cemb")).as("d2"))
      .groupBy("vec_id", "label")
      .agg(sqrt(max(when(col("clabel") === col("label"), col("d2")))).as("a"),
        sqrt(min(when(col("clabel") =!= col("label"), col("d2")))).as("b"))
    ab.select(col("vec_id"), col("label"),
        when(greatest(col("a"), col("b")) > 0.0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(lit(0.0)).as("sil"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_points"),
        round(aggregate(array_sort(collect_list(struct(col("vec_id"), col("sil")))),
          lit(0.0), (acc, x) => acc + x("sil")) /
          count(lit(1)).cast(DoubleType), 9).as("mean_silhouette"))
      .orderBy("label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_silhouette"        -> simSilhouette _,
    "sim_matryoshka_topk"  -> simMatryoshkaTopk _,
    "sim_hybrid_rrf"       -> simHybridRrf _,
    "dedup_srp_lsh"        -> dedupSrpLsh _,
    "sim_knn_batch_ivf"    -> simKnnBatchIvf _,
    "sim_pca_power_iter"   -> simPcaPowerIter _,
    "dedup_semantic_cells" -> dedupSemanticCells _,
    "sim_ann_recall_eval" -> simAnnRecallEval _,
    "sim_cosine_topk"     -> simCosineTopk _,
    "sim_lsh_bucket_topk" -> simLshBucketTopk _,
    "sim_knn_per_label"   -> simKnnPerLabel _,
    "sim_ivf_coarse_topk" -> simIvfCoarseTopk _,
    "sim_product_quantization" -> simProductQuantization _,
    "sim_binary_hamming_topk"  -> simBinaryHammingTopk _,
    "sim_ivf_pq_adc"           -> simIvfPqAdc _,
    "sim_ann_ivfpq_recall"     -> simAnnIvfpqRecall _,
    "sim_kmeans_step"     -> simKmeansStep _,
    "sim_quantize_int8"   -> simQuantizeInt8 _,
    "sim_mips_augmented"  -> simMipsAugmented _,
  )

  // ---- DuckDB oracle (identical IEEE op order: widen→multiply in index
  // order→left-fold sum seeded 0.0→sqrt of product) ----

  private def fold(v: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $v), (s, x) -> s + x)"
  private def packHalfSql(arr: String, lo: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(${lo + 1}, ${lo + 33}),
       |      i -> CASE WHEN $arr[i] >= 0 THEN CAST(1 AS BIGINT) << (i - ${lo + 1})
       |           ELSE CAST(0 AS BIGINT) END)), (s, x) -> s + x)""".stripMargin

  private def subDotSql(a: String, b: String): String =
    fold(s"list_transform(range(8*m + 1, 8*m + 9), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))")

  private def dotSql(a: String, b: String): String = OracleSql.dotFold(a, b)
  private val cosSql =
    s"""${dotSql("e.embedding", "p.q")} / sqrt(
       |  ${dotSql("e.embedding", "e.embedding")} * ${dotSql("p.q", "p.q")})""".stripMargin
  private val probeCte =
    s"SELECT embedding AS q FROM embeddings WHERE vec_id = $ProbeId"
  private val bucketSql = // sign bits of dims 1..4
    (0 until 4).map(i => s"(CASE WHEN EMB[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
      .mkString("(", " + ", ")")

  private val knnBatchCos =
    s"""${dotSql("x.embedding", "y.embedding")} / sqrt(
       |  ${dotSql("x.embedding", "x.embedding")} * ${dotSql("y.embedding", "y.embedding")})""".stripMargin

  /** SRP plane literals for the oracle — the SAME Scala-computed ±1
    * vectors the engine folds into its projection, rendered as DuckDB
    * list literals: (plane_id, [s1..s64]). */
  private val srpPlanesSql = (0 until 16).map { p =>
    val s = (0 until Dim).map(j => if (srpSign(p, j) > 0) "1.0" else "-1.0")
    s"($p, [${s.mkString(", ")}]::DOUBLE[])"
  }.mkString(",\n  ")

  val oracle: Map[String, String] = Map(
    "sim_silhouette" ->
      """WITH x AS (SELECT label, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
        |    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |cent AS (SELECT label, dim, ROUND(SUM(v) / COUNT(*), 12) AS c
        |  FROM x GROUP BY 1, 2),
        |carr AS (SELECT label AS clabel, list(c ORDER BY dim) AS cemb
        |  FROM cent GROUP BY label),
        |dd AS (SELECT e.vec_id, e.label, carr.clabel,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(e.embedding) + 1),
        |        i -> (CAST(e.embedding[i] AS DOUBLE) - carr.cemb[i]) *
        |             (CAST(e.embedding[i] AS DOUBLE) - carr.cemb[i]))),
        |      (s, z) -> s + z) AS d2
        |  FROM embeddings e CROSS JOIN carr),
        |ab AS (SELECT vec_id, label,
        |    sqrt(MAX(CASE WHEN clabel = label THEN d2 END)) AS a,
        |    sqrt(MIN(CASE WHEN clabel <> label THEN d2 END)) AS b
        |  FROM dd GROUP BY vec_id, label),
        |sil AS (SELECT vec_id, label,
        |    CASE WHEN GREATEST(a, b) > 0.0
        |         THEN (b - a) / GREATEST(a, b) ELSE 0.0 END AS sil
        |  FROM ab)
        |SELECT label, COUNT(*) AS n_points,
        |  ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(sil ORDER BY vec_id)), (s, z) -> s + z) /
        |    CAST(COUNT(*) AS DOUBLE), 9) AS mean_silhouette
        |FROM sil GROUP BY label ORDER BY label""".stripMargin,
    "sim_matryoshka_topk" ->
      s"""WITH p AS (SELECT embedding AS q,
         |    list_slice(embedding, 1, 16) AS qhead
         |  FROM embeddings WHERE vec_id = $ProbeId),
         |c AS (SELECT e.vec_id, e.embedding, p.q, p.qhead,
         |    list_slice(e.embedding, 1, 16) AS head
         |  FROM embeddings e CROSS JOIN p WHERE e.vec_id <> $ProbeId),
         |s AS (SELECT vec_id, embedding, q,
         |    ${dotSql("head", "qhead")} / sqrt(
         |      ${dotSql("head", "head")} * ${dotSql("qhead", "qhead")})
         |      AS coarse_cos
         |  FROM c ORDER BY coarse_cos DESC, vec_id LIMIT 50)
         |SELECT vec_id, coarse_cos,
         |  ${dotSql("embedding", "q")} / sqrt(
         |    ${dotSql("embedding", "embedding")} * ${dotSql("q", "q")}) AS cos
         |FROM s ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "sim_hybrid_rrf" ->
      s"""WITH tok AS (SELECT doc_id,
         |    list_distinct(${TextQueries.tokensSql}) AS tok FROM documents),
         |pt AS (SELECT doc_id AS probe_id, tok AS ptok FROM tok
         |  WHERE doc_id < 3),
         |lex AS (SELECT pt.probe_id, t.doc_id,
         |    CAST(len(list_filter(t.tok, x -> list_contains(pt.ptok, x)))
         |        AS DOUBLE) /
         |      CAST(len(t.tok) + len(pt.ptok) -
         |        len(list_filter(t.tok, x -> list_contains(pt.ptok, x)))
         |        AS DOUBLE) AS jacc
         |  FROM tok t CROSS JOIN pt
         |  WHERE t.doc_id <> pt.probe_id
         |    AND len(list_filter(t.tok, x -> list_contains(pt.ptok, x))) > 0),
         |lt AS (SELECT probe_id, doc_id, lex_rank FROM (
         |    SELECT probe_id, doc_id, ROW_NUMBER() OVER (
         |      PARTITION BY probe_id ORDER BY jacc DESC, doc_id) AS lex_rank
         |    FROM lex) WHERE lex_rank <= 20),
         |pv AS (SELECT vec_id AS probe_id, embedding AS pemb
         |  FROM embeddings WHERE vec_id < 3),
         |vec AS (SELECT pv.probe_id, e.vec_id AS doc_id,
         |    ${dotSql("e.embedding", "pv.pemb")} / sqrt(
         |      ${dotSql("e.embedding", "e.embedding")} *
         |      ${dotSql("pv.pemb", "pv.pemb")}) AS cos
         |  FROM embeddings e CROSS JOIN pv
         |  WHERE e.vec_id <> pv.probe_id),
         |vt AS (SELECT probe_id, doc_id, vec_rank FROM (
         |    SELECT probe_id, doc_id, ROW_NUMBER() OVER (
         |      PARTITION BY probe_id ORDER BY cos DESC, doc_id) AS vec_rank
         |    FROM vec) WHERE vec_rank <= 20),
         |f AS (SELECT COALESCE(lt.probe_id, vt.probe_id) AS probe_id,
         |    COALESCE(lt.doc_id, vt.doc_id) AS doc_id,
         |    lt.lex_rank, vt.vec_rank,
         |    COALESCE(CAST(1 AS DOUBLE) / (lt.lex_rank + 60),
         |      CAST(0 AS DOUBLE)) +
         |    COALESCE(CAST(1 AS DOUBLE) / (vt.vec_rank + 60),
         |      CAST(0 AS DOUBLE)) AS rrf
         |  FROM lt FULL OUTER JOIN vt
         |    ON lt.probe_id = vt.probe_id AND lt.doc_id = vt.doc_id)
         |SELECT probe_id, doc_id, rk, rrf, lex_rank, vec_rank FROM (
         |  SELECT probe_id, doc_id, ROW_NUMBER() OVER (
         |      PARTITION BY probe_id ORDER BY rrf DESC, doc_id) AS rk,
         |    rrf, lex_rank, vec_rank
         |  FROM f) WHERE rk <= 5
         |ORDER BY probe_id, rk""".stripMargin,
    "dedup_srp_lsh" ->
      s"""WITH planes(pl, s) AS (VALUES
         |  $srpPlanesSql),
         |proj AS (SELECT e.vec_id, p.pl,
         |    ${fold("list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * p.s[i])")} AS pr
         |  FROM embeddings e CROSS JOIN planes p
         |  WHERE len(e.embedding) = $Dim),
         |sig AS (SELECT vec_id,
         |    SUM(CASE WHEN pl < 8 AND pr >= 0 THEN (1 << pl) ELSE 0 END) AS b0,
         |    SUM(CASE WHEN pl >= 8 AND pr >= 0 THEN (1 << (pl - 8)) ELSE 0 END) AS b1
         |  FROM proj GROUP BY vec_id),
         |bands AS (SELECT vec_id, 0 AS b, b0 AS k FROM sig
         |  UNION ALL SELECT vec_id, 1, b1 FROM sig),
         |cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
         |  FROM bands x JOIN bands y
         |    ON x.b = y.b AND x.k = y.k AND x.vec_id < y.vec_id)
         |SELECT a_id, b_id, $knnBatchCos AS cos
         |FROM cand JOIN embeddings x ON x.vec_id = a_id
         |          JOIN embeddings y ON y.vec_id = b_id
         |WHERE $knnBatchCos >= $SrpTau
         |ORDER BY a_id, b_id""".stripMargin,
    "sim_knn_batch_ivf" ->
      s"""WITH nc AS (SELECT greatest(8, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS nc
         |  FROM embeddings),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings, nc WHERE vec_id <= nc.nc),
         |d2all AS (SELECT e.vec_id, c.cid,
         |    ${dotSql("e.embedding", "e.embedding")} +
         |    ${dotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${dotSql("e.embedding", "c.cemb")} AS d2
         |  FROM embeddings e CROSS JOIN cent c),
         |asgn AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM d2all) WHERE rn = 1),
         |f AS (SELECT e.vec_id, a.cid, e.embedding
         |  FROM embeddings e JOIN asgn a ON a.vec_id = e.vec_id)
         |SELECT q_id, rk, nbr_id, cos FROM (
         |  SELECT x.vec_id AS q_id, y.vec_id AS nbr_id,
         |    $knnBatchCos AS cos,
         |    CAST(row_number() OVER (PARTITION BY x.vec_id
         |      ORDER BY $knnBatchCos DESC, y.vec_id) AS INTEGER) AS rk
         |  FROM f x JOIN f y ON x.cid = y.cid AND x.vec_id <> y.vec_id)
         |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin,
    "sim_ann_recall_eval" ->
      s"""WITH p AS (SELECT vec_id AS pid, embedding AS q
         |  FROM embeddings WHERE vec_id BETWEEN 11 AND 20),
         |scored AS (SELECT p.pid, e.vec_id, $cosSql AS cos
         |  FROM embeddings e CROSS JOIN p WHERE e.vec_id <> p.pid),
         |exact AS (SELECT pid, vec_id FROM (
         |    SELECT pid, vec_id,
         |      row_number() OVER (PARTITION BY pid ORDER BY cos DESC, vec_id) AS rk
         |    FROM scored) WHERE rk <= 5),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id <= $NCells),
         |d2all AS (SELECT e.vec_id, c.cid,
         |    ${dotSql("e.embedding", "e.embedding")} +
         |    ${dotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${dotSql("e.embedding", "c.cemb")} AS d2
         |  FROM embeddings e CROSS JOIN cent c),
         |asgn AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM d2all) WHERE rn = 1),
         |pcells AS (SELECT pid, cid FROM (
         |    SELECT vec_id AS pid, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM d2all WHERE vec_id BETWEEN 11 AND 20) WHERE rn <= $NProbe),
         |approx AS (SELECT pid, vec_id FROM (
         |    SELECT s.pid, s.vec_id,
         |      row_number() OVER (PARTITION BY s.pid ORDER BY s.cos DESC, s.vec_id) AS rk
         |    FROM scored s
         |    JOIN asgn a ON a.vec_id = s.vec_id
         |    JOIN pcells pc ON pc.pid = s.pid AND pc.cid = a.cid) WHERE rk <= 5),
         |hits AS (SELECT e.pid, COUNT(*) AS n_hit FROM exact e
         |  JOIN approx x ON e.pid = x.pid AND e.vec_id = x.vec_id GROUP BY 1)
         |SELECT p.pid, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(5.0 AS DOUBLE) AS recall
         |FROM p LEFT JOIN hits h ON p.pid = h.pid ORDER BY p.pid""".stripMargin,
    "sim_mips_augmented" ->
      s"""WITH m AS (SELECT MAX(${dotSql("embedding", "embedding")}) AS m2
         |  FROM embeddings),
         |p AS (SELECT embedding AS q,
         |    ${dotSql("embedding", "embedding")} AS qnsq
         |  FROM embeddings WHERE vec_id = $ProbeId)
         |SELECT e.vec_id,
         |  ${dotSql("e.embedding", "p.q")} AS ip,
         |  m.m2 + p.qnsq - CAST(2.0 AS DOUBLE) * ${dotSql("e.embedding", "p.q")}
         |    AS aug_l2sq
         |FROM embeddings e CROSS JOIN m CROSS JOIN p
         |WHERE e.vec_id <> $ProbeId
         |ORDER BY aug_l2sq, e.vec_id LIMIT 10""".stripMargin,
    "sim_cosine_topk" ->
      s"""SELECT e.vec_id, $cosSql AS cos
         |FROM embeddings e CROSS JOIN ($probeCte) p
         |WHERE e.vec_id <> $ProbeId
         |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin,
    "sim_lsh_bucket_topk" ->
      s"""SELECT e.vec_id, CAST(${bucketSql.replace("EMB", "e.embedding")} AS INTEGER) AS bucket, $cosSql AS cos
         |FROM embeddings e CROSS JOIN (SELECT embedding AS q FROM embeddings WHERE vec_id = $ProbeId) p
         |WHERE e.vec_id <> $ProbeId
         |  AND ${bucketSql.replace("EMB", "e.embedding")} = ${bucketSql.replace("EMB", "p.q")}
         |ORDER BY cos DESC, e.vec_id LIMIT 5""".stripMargin,
    "sim_knn_per_label" ->
      s"""SELECT label, rk, vec_id, cos FROM (
         |  SELECT e.label, e.vec_id, $cosSql AS cos,
         |    CAST(row_number() OVER (PARTITION BY e.label ORDER BY $cosSql DESC, e.vec_id) AS INTEGER) AS rk
         |  FROM embeddings e CROSS JOIN ($probeCte) p
         |  WHERE e.vec_id <> $ProbeId)
         |WHERE rk <= 3 ORDER BY label, rk""".stripMargin,
    "sim_pca_power_iter" ->
      // per-row score = the same index-order dot against the v0
      // literal; per-dim accumulation in the same 2^32 fixed point
      // (floor(term·2^32) is engine-identical; the integer sum is
      // exact — DuckDB widens to HUGEINT, Spark stays in the audited
      // 2^63 headroom)
      s"""WITH sc AS (SELECT vec_id, embedding,
         |    ${fold(s"list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * CAST((i-1) % 5 - 2 AS DOUBLE))")} AS s
         |  FROM embeddings WHERE len(embedding) = $Dim),
         |ex AS (SELECT
         |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         |    unnest(embedding) AS x, s
         |  FROM sc)
         |SELECT dim, COUNT(*) AS n,
         |  CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * s * 4294967296.0)
         |    AS BIGINT)) AS DOUBLE) / 4294967296.0 AS w
         |FROM ex GROUP BY dim ORDER BY dim""".stripMargin,
    "dedup_semantic_cells" ->
      // same assignment CTE as the IVF oracle (argmin by (d2, cid)),
      // then the intra-cell pair join with the identical cosine fold
      s"""WITH nc AS (SELECT greatest($SemCellsFloor,
         |    CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS nc
         |  FROM embeddings),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings, nc WHERE vec_id <= nc.nc),
         |d2all AS (SELECT e.vec_id, c.cid,
         |    ${dotSql("e.embedding", "e.embedding")} +
         |    ${dotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${dotSql("e.embedding", "c.cemb")} AS d2
         |  FROM embeddings e CROSS JOIN cent c),
         |asgn AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM d2all) WHERE rn = 1)
         |SELECT aa.cid AS cell, a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${dotSql("a.embedding", "b.embedding")} / sqrt(
         |    ${dotSql("a.embedding", "a.embedding")} *
         |    ${dotSql("b.embedding", "b.embedding")}) AS cos
         |FROM embeddings a
         |JOIN asgn aa ON a.vec_id = aa.vec_id
         |JOIN asgn ab ON aa.cid = ab.cid AND a.vec_id < ab.vec_id
         |JOIN embeddings b ON b.vec_id = ab.vec_id
         |WHERE ${dotSql("a.embedding", "b.embedding")} / sqrt(
         |    ${dotSql("a.embedding", "a.embedding")} *
         |    ${dotSql("b.embedding", "b.embedding")}) >= $SemTau
         |ORDER BY a_id, b_id""".stripMargin,
    "sim_ann_ivfpq_recall" ->
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < 4),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |pr AS (SELECT vec_id AS pid, embedding AS q FROM embeddings
         |  WHERE vec_id BETWEEN 11 AND 20),
         |ex AS (SELECT pr.pid, e.vec_id,
         |    ${dotSql("e.embedding", "e.embedding")} +
         |    ${dotSql("pr.q", "pr.q")} -
         |    2.0 * ${dotSql("e.embedding", "pr.q")} AS d2
         |  FROM embeddings e CROSS JOIN pr WHERE e.vec_id <> pr.pid),
         |exact AS (SELECT pid, vec_id FROM (
         |    SELECT pid, vec_id,
         |      row_number() OVER (PARTITION BY pid ORDER BY d2, vec_id) AS rk
         |    FROM ex) WHERE rk <= 10),
         |sub AS (SELECT e.vec_id, ms.m, c.cid,
         |    ${subDotSql("e.embedding", "e.embedding")} +
         |    ${subDotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${subDotSql("e.embedding", "c.cemb")} AS d2
         |  FROM embeddings e CROSS JOIN ms CROSS JOIN cent c),
         |best AS (SELECT vec_id, m, cid, d2,
         |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid)
         |      AS rn
         |  FROM sub),
         |cd AS (SELECT vec_id, m, cid AS code FROM best WHERE rn = 1),
         |dt AS (SELECT pr.pid, ms.m, c.cid AS code,
         |    ${subDotSql("pr.q", "pr.q")} +
         |    ${subDotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${subDotSql("pr.q", "c.cemb")} AS dq
         |  FROM pr CROSS JOIN ms CROSS JOIN cent c),
         |adc AS (SELECT dt.pid, cd.vec_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(dt.dq ORDER BY cd.m)), (s, x) -> s + x) AS adc_d2
         |  FROM cd JOIN dt ON dt.m = cd.m AND dt.code = cd.code
         |  GROUP BY dt.pid, cd.vec_id),
         |approx AS (SELECT pid, vec_id FROM (
         |    SELECT pid, vec_id,
         |      row_number() OVER (PARTITION BY pid ORDER BY adc_d2, vec_id)
         |        AS rk
         |    FROM adc WHERE vec_id <> pid) WHERE rk <= 10),
         |hits AS (SELECT exact.pid, COUNT(*) AS n_hit
         |  FROM exact JOIN approx
         |    ON approx.pid = exact.pid AND approx.vec_id = exact.vec_id
         |  GROUP BY exact.pid)
         |SELECT pr.pid, CAST(COALESCE(hits.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / 10.0 AS recall_at_10
         |FROM pr LEFT JOIN hits ON hits.pid = pr.pid
         |ORDER BY pr.pid""".stripMargin,
    "sim_ivf_pq_adc" ->
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < 4),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |sub AS (SELECT e.vec_id, ms.m, c.cid,
         |    ${subDotSql("e.embedding", "e.embedding")} +
         |    ${subDotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${subDotSql("e.embedding", "c.cemb")} AS d2
         |  FROM embeddings e CROSS JOIN ms CROSS JOIN cent c),
         |best AS (SELECT vec_id, m, cid, d2,
         |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid)
         |      AS rn
         |  FROM sub),
         |cd AS (SELECT vec_id, m, cid AS code FROM best WHERE rn = 1),
         |pr AS (SELECT embedding AS q FROM embeddings WHERE vec_id = $ProbeId),
         |dt AS (SELECT ms.m, c.cid AS code,
         |    ${subDotSql("pr.q", "pr.q")} +
         |    ${subDotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${subDotSql("pr.q", "c.cemb")} AS dq
         |  FROM pr CROSS JOIN ms CROSS JOIN cent c),
         |adc AS (SELECT cd.vec_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(dt.dq ORDER BY cd.m)), (s, x) -> s + x) AS adc_d2
         |  FROM cd JOIN dt ON dt.m = cd.m AND dt.code = cd.code
         |  GROUP BY cd.vec_id),
         |ex AS (SELECT e.vec_id,
         |    ${dotSql("e.embedding", "e.embedding")} +
         |    ${dotSql("pr.q", "pr.q")} -
         |    2.0 * ${dotSql("e.embedding", "pr.q")} AS exact_d2
         |  FROM embeddings e CROSS JOIN pr)
         |SELECT adc.vec_id, adc.adc_d2, ex.exact_d2
         |FROM adc JOIN ex ON ex.vec_id = adc.vec_id
         |WHERE adc.vec_id <> $ProbeId
         |ORDER BY adc.adc_d2, adc.vec_id LIMIT 10""".stripMargin,
    "sim_binary_hamming_topk" ->
      // integer sign-pack / xor / popcount mirror the engine exactly;
      // only the audit cosine is FP (standard fold fragments)
      s"""WITH sig AS (SELECT vec_id, embedding,
         |    ${packHalfSql("embedding", 0)} AS h0,
         |    ${packHalfSql("embedding", 32)} AS h1
         |  FROM embeddings),
         |p AS (SELECT embedding AS q, h0 AS p0, h1 AS p1
         |  FROM sig WHERE vec_id = $ProbeId)
         |SELECT s.vec_id,
         |  CAST(bit_count(xor(s.h0, p.p0)) + bit_count(xor(s.h1, p.p1))
         |    AS INTEGER) AS hamming,
         |  ${dotSql("s.embedding", "p.q")} / sqrt(
         |    ${dotSql("s.embedding", "s.embedding")} * ${dotSql("p.q", "p.q")})
         |    AS cos
         |FROM sig s CROSS JOIN p
         |WHERE s.vec_id <> $ProbeId
         |ORDER BY hamming, s.vec_id LIMIT 10""".stripMargin,
    "sim_product_quantization" ->
      // subspace d2 mirrors the engine association ((nsq_a + nsq_c) -
      // 2.0*dot) with the same index-order folds over the m-th slice
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < 4),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |sub AS (SELECT e.vec_id, ms.m, c.cid,
         |    ${subDotSql("e.embedding", "e.embedding")} +
         |    ${subDotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${subDotSql("e.embedding", "c.cemb")} AS d2
         |  FROM embeddings e CROSS JOIN ms CROSS JOIN cent c),
         |best AS (SELECT vec_id, m, cid, d2,
         |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid)
         |      AS rn
         |  FROM sub),
         |cd AS (SELECT vec_id, m, cid AS code, d2 FROM best WHERE rn = 1)
         |SELECT vec_id,
         |  CAST(SUM(code << CAST(2 * m AS INTEGER)) AS BIGINT) AS pq_code,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(d2 ORDER BY m)), (s, x) -> s + x) AS recon_err2
         |FROM cd GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "sim_ivf_coarse_topk" ->
      // d2 = (nsq_v + nsq_c) - (2.0 * dot): same association order as the
      // Spark expression; nsq/dot are the identical left-fold fragments
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id <= 8),
         |d2all AS (SELECT e.vec_id, c.cid,
         |    ${dotSql("e.embedding", "e.embedding")} +
         |    ${dotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${dotSql("e.embedding", "c.cemb")} AS d2
         |  FROM embeddings e CROSS JOIN cent c),
         |asgn AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM d2all) WHERE rn = 1),
         |pcells AS (SELECT cid FROM (
         |    SELECT cid, row_number() OVER (ORDER BY d2, cid) AS rn
         |    FROM d2all WHERE vec_id = $ProbeId) WHERE rn <= 2)
         |SELECT e.vec_id, a.cid AS cell, $cosSql AS cos
         |FROM embeddings e
         |JOIN asgn a ON a.vec_id = e.vec_id
         |JOIN pcells pc ON a.cid = pc.cid
         |CROSS JOIN ($probeCte) p
         |WHERE e.vec_id <> $ProbeId
         |ORDER BY cos DESC, e.vec_id LIMIT 5""".stripMargin,
    "sim_kmeans_step" ->
      // same assignment CTE as IVF; the mean is the engine's production
      // sum(x)/n, round(12) absorbing sum-order ulp drift on both sides
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id <= 8),
         |d2all AS (SELECT e.vec_id, c.cid,
         |    ${dotSql("e.embedding", "e.embedding")} +
         |    ${dotSql("c.cemb", "c.cemb")} -
         |    2.0 * ${dotSql("e.embedding", "c.cemb")} AS d2
         |  FROM embeddings e CROSS JOIN cent c),
         |asgn AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM d2all) WHERE rn = 1),
         |ex AS (SELECT a.cid AS cell, e.vec_id,
         |    CAST(generate_subscripts(e.embedding, 1) AS BIGINT) AS dim,
         |    unnest(e.embedding) AS x
         |  FROM embeddings e JOIN asgn a ON a.vec_id = e.vec_id)
         |SELECT cell, dim,
         |  round(SUM(CAST(x AS DOUBLE)) / CAST(COUNT(*) AS DOUBLE), 12)
         |    AS centroid,
         |  COUNT(*) AS n
         |FROM ex GROUP BY cell, dim ORDER BY cell, dim""".stripMargin,
    "sim_quantize_int8" ->
      // q[i] and the error term are spelled with the engine's exact op
      // order: clamp→*127→round (half away from zero on both engines),
      // (x - q/127)*(x - q/127), left-fold seeded 0/0.0
      s"""SELECT vec_id, label,
         |  CAST(len(embedding) AS INTEGER) AS n_dims,
         |  CAST(len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) > 1.0)) AS INTEGER) AS n_clipped,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(embedding, x ->
         |        CAST(round(greatest(-1.0, least(1.0, CAST(x AS DOUBLE))) * 127.0) AS BIGINT))),
         |    (a, b) -> a + b) AS q_sum,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(embedding, x ->
         |        (CAST(x AS DOUBLE) - CAST(round(greatest(-1.0, least(1.0, CAST(x AS DOUBLE))) * 127.0) AS DOUBLE) / 127.0) *
         |        (CAST(x AS DOUBLE) - CAST(round(greatest(-1.0, least(1.0, CAST(x AS DOUBLE))) * 127.0) AS DOUBLE) / 127.0))),
         |    (a, b) -> a + b) AS l2_err
         |FROM embeddings ORDER BY vec_id""".stripMargin,
  )
}
