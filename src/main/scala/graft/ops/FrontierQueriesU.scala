package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-9 frontier wave 25: exact SHAPLEY-VALUE channel attribution —
  * the game-theoretically principled form of the heuristic attribution
  * models already in the registry (`window_attribution_lasttouch`
  * credits the final touch, `window_attribution_ushaped` a fixed
  * positional split; Shapley is the unique credit rule satisfying
  * efficiency/symmetry/null-player, and the one ad-platform attribution
  * actually converged on). Novelty grep-checked against all 390 names.
  */
object FrontierQueriesU {

  /** EXACT SHAPLEY ATTRIBUTION over the three pre-purchase engagement
    * channels (view, click, signup): each converter's exposure set is
    * the channels they emitted BEFORE their first purchase (ordered by
    * event_id — ts-monotone per user in this corpus, and integer order
    * sidesteps every cross-engine timestamp trap); the coalition value
    * v(S) counts converters whose exposure ⊆ S (they would still have
    * been reached in a world where only S exists); channel i's credit
    * is the exact 3-player Shapley sum
    * φᵢ = Σ_{S∌i} |S|!·(2−|S|)!/3! · (v(S∪i) − v(S)).
    *
    * Determinism: exposure masks and all eight v(S) are exact
    * integers; the Shapley weights enter as INTEGER numerators over a
    * common denominator 6 (|S| = 0,1,2 → 2,1,2), so φᵢ is one integer
    * sum followed by ONE double division — no rational rounding
    * anywhere. The efficiency axiom Σφᵢ = v({all}) − v(∅) is an exact
    * integer identity, asserted by the spec.
    *
    * Scale posture: one per-user rollup of the fact table (first
    * purchase id + three conditional exposure bits in a single pass),
    * an 8-row mask rollup, and constant-size coalition joins (8×8
    * containment grid, 12 Shapley terms). Nothing after the first
    * rollup depends on the corpus size. */
  def aggShapleyChannel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // first purchase per user; converters only (attribution divides
    // credit for CONVERSIONS; non-converters contribute nothing here)
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("event_id").as("fp"))
    val mask = ev.join(firstBuy, Seq("user_id"))
      .filter(col("event_id") < col("fp"))
      .groupBy("user_id")
      .agg((max(when(col("event_type") === "view", 1L).otherwise(0L)) +
        max(when(col("event_type") === "click", 2L).otherwise(0L)) +
        max(when(col("event_type") === "signup", 4L).otherwise(0L)))
        .as("m"))
    // converters with NO pre-purchase event of any kind never enter
    // `mask` (the filter drops them) — re-enter them as mask 0 via a
    // left join from the converter set
    val conv = firstBuy.join(mask, Seq("user_id"), "left")
      .select(coalesce(col("m"), lit(0L)).as("m"))
      .groupBy("m").agg(count(lit(1)).as("n_users"))
    val coalitions = s.range(8).select(col("id").as("smask"))
    // m ⊆ S ⟺ m & (7 − S) = 0: the 3-bit complement spelled as plain
    // arithmetic (7 − S ≡ 7 XOR S on this domain) — no bitwise-NOT
    // portability questions in either engine
    val v = coalitions.join(broadcast(conv),
        col("m").bitwiseAND(lit(7L) - col("smask")) === 0L, "left")
      .groupBy("smask").agg(sum(coalesce(col("n_users"), lit(0L))).as("v"))
    // 12 Shapley terms: (channel bit, sub-coalition S without the
    // channel, integer weight numerator over 6)
    val terms = s.createDataFrame(Seq(
      // view (bit 1): S ∈ {∅, {c}, {s}, {c,s}} → weights 2,1,1,2
      ("view", 1L, 0L, 2L), ("view", 1L, 2L, 1L),
      ("view", 1L, 4L, 1L), ("view", 1L, 6L, 2L),
      ("click", 2L, 0L, 2L), ("click", 2L, 1L, 1L),
      ("click", 2L, 4L, 1L), ("click", 2L, 5L, 2L),
      ("signup", 4L, 0L, 2L), ("signup", 4L, 1L, 1L),
      ("signup", 4L, 2L, 1L), ("signup", 4L, 3L, 2L)))
      .toDF("channel", "bit", "smask", "wnum")
    terms
      .join(broadcast(v.withColumnRenamed("v", "v0")), Seq("smask"))
      .join(broadcast(v.select((col("smask")).as("smask_i"), col("v").as("v1"))),
        col("smask_i") === (col("smask").bitwiseOR(col("bit"))))
      .groupBy("channel")
      .agg(sum(col("wnum") * (col("v1") - col("v0"))).as("num"))
      .select(col("channel"),
        round(col("num").cast(DoubleType) / 6.0, 9).as("shapley_conversions"))
      .orderBy("channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_shapley_channel" -> aggShapleyChannel _,
  )

  val oracle: Map[String, String] = Map(
    "agg_shapley_channel" ->
      """WITH fb AS (
        |  SELECT user_id, MIN(event_id) AS fp FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |mask AS (
        |  SELECT e.user_id,
        |    MAX(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END) +
        |    MAX(CASE WHEN e.event_type = 'click' THEN 2 ELSE 0 END) +
        |    MAX(CASE WHEN e.event_type = 'signup' THEN 4 ELSE 0 END) AS m
        |  FROM events e JOIN fb ON e.user_id = fb.user_id
        |  WHERE e.event_id < fb.fp GROUP BY 1),
        |conv AS (
        |  SELECT COALESCE(m.m, 0) AS m, CAST(COUNT(*) AS BIGINT) AS n_users
        |  FROM fb LEFT JOIN mask m ON fb.user_id = m.user_id GROUP BY 1),
        |co AS (SELECT unnest(range(0, 8)) AS smask),
        |v AS (
        |  SELECT co.smask,
        |    CAST(COALESCE(SUM(conv.n_users), 0) AS BIGINT) AS v
        |  FROM co LEFT JOIN conv ON (conv.m & (7 - co.smask)) = 0
        |  GROUP BY 1),
        |terms AS (SELECT * FROM (VALUES
        |  ('view', 1, 0, 2), ('view', 1, 2, 1),
        |  ('view', 1, 4, 1), ('view', 1, 6, 2),
        |  ('click', 2, 0, 2), ('click', 2, 1, 1),
        |  ('click', 2, 4, 1), ('click', 2, 5, 2),
        |  ('signup', 4, 0, 2), ('signup', 4, 1, 1),
        |  ('signup', 4, 2, 1), ('signup', 4, 3, 2))
        |  AS t(channel, bit, smask, wnum))
        |SELECT t.channel,
        |  ROUND(CAST(SUM(t.wnum * (v1.v - v0.v)) AS DOUBLE) / 6.0, 9)
        |    AS shapley_conversions
        |FROM terms t
        |JOIN v v0 ON v0.smask = t.smask
        |JOIN v v1 ON v1.smask = (t.smask | t.bit)
        |GROUP BY 1 ORDER BY t.channel""".stripMargin,
  )
}
