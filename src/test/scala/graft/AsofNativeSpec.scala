package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofQueries
import graft.plans.AsofJoin

/** Differential + edge tests for the native as-of join operator
  * (custom LogicalPlan/SparkStrategy/SparkPlan). The union+last_value
  * composition in AsofQueries is the reference double; the DuckDB ASOF
  * JOIN oracle is the third independent implementation. */
class AsofNativeSpec extends SparkTestBase {

  test("native as-of join equals the union+last_value formulation") {
    val native = AsofQueries.joinAsofNative(spark, sfDir).collect().toSeq
    val composed = AsofQueries.joinAsofDaily(spark, sfDir).collect().toSeq
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("plans through AsofJoinExec with no window and a per-side shuffle") {
    val p = AsofQueries.joinAsofNative(spark, sfDir)
      .queryExecution.executedPlan.toString
    // physical node renders as "AsofJoin <keys>" (TreeNode strips "Exec")
    assert(p.contains("AsofJoin "), p)
    assert(!p.contains("Window"), p)
    // one hash exchange per side: the build-side agg REUSES the
    // user_id repartition (hash subset rule) and reaches the merge
    // with no further shuffle
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2, p)
  }

  test("backward-inclusive semantics, nulls never match, empty build side") {
    import spark.implicits._
    val probe = Seq(
      (1L, Some(10L), 5L),   // before any build row -> null
      (2L, Some(10L), 10L),  // exact time match (inclusive) -> 100
      (3L, Some(10L), 17L),  // between build rows -> latest <= 17 is 15 -> 150
      (4L, Some(10L), 99L),  // after all build rows -> 150
      (5L, Some(77L), 50L),  // key with no build rows -> null
      (6L, None, 50L)        // null key -> null
    ).toDF("id", "k", "t")
      .select(col("id"), col("k").as("user"), col("t").as("when"))
    val build = Seq((10L, 10L, 100L), (10L, 15L, 150L), (20L, 1L, 999L))
      .toDF("r_user", "r_when", "v")

    val got = AsofJoin(probe, build, "user", "r_user", "when", "r_when")
      .select(col("id"), col("v")).orderBy("id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
    assert(got == Seq(1L -> None, 2L -> Some(100L), 3L -> Some(150L),
      4L -> Some(150L), 5L -> None, 6L -> None))
  }

  test("native as-of join equals a brute-force reference on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val probe = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(60).toLong))
    // unique (key, time) on the build side: duplicate times would make
    // the as-of value ambiguous in ANY implementation
    val build = rnd.shuffle(
      (for (k <- 0L until 12L; t <- 0L until 60L if rnd.nextDouble() < 0.15)
        yield (k, t, k * 1000 + t)).toSeq)
    val probeDf = probe.toDF("id", "k", "t")
    val buildDf = build.toDF("bk", "bt", "v")
    val got = AsofJoin(probeDf, buildDf, "k", "bk", "t", "bt")
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val byKey = build.groupBy(_._1)
    val want = probe.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3).getOrElse(-1L)
    }.toMap
    assert(got == want)
  }

  test("tolerance gate equals a brute-force reference on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val probe = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(60).toLong))
    val build = rnd.shuffle(
      (for (k <- 0L until 12L; t <- 0L until 60L if rnd.nextDouble() < 0.15)
        yield (k, t, k * 1000 + t)).toSeq)
    val probeDf = probe.toDF("id", "k", "t")
    val buildDf = build.toDF("bk", "bt", "v")
    val byKey = build.groupBy(_._1)
    for (tol <- Seq(0L, 5L, 100L)) {
      val got = AsofJoin(probeDf, buildDf, "k", "bk", "t", "bt", Some(tol))
        .select(col("id"), col("v")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val want = probe.map { case (id, k, t) =>
        id -> byKey.getOrElse(k, Seq.empty)
          .filter(b => b._2 <= t && t - b._2 <= tol)
          .sortBy(_._2).lastOption.map(_._3).getOrElse(-1L)
      }.toMap
      assert(got == want, s"tolerance $tol")
    }
    // tol=100 covers the whole axis: must equal the unbounded operator
    val unbounded = AsofJoin(probeDf, buildDf, "k", "bk", "t", "bt")
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val wide = AsofJoin(probeDf, buildDf, "k", "bk", "t", "bt", Some(100L))
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(wide == unbounded)
  }

  test("tolerance misuse fails at build time") {
    import spark.implicits._
    val l = Seq((1L, "a", "x")).toDF("id", "k", "t")
    val r = Seq(("a", "x", 1L)).toDF("bk", "bt", "v")
    // string time axis has no distance metric
    intercept[IllegalArgumentException] {
      AsofJoin(l, r, "k", "bk", "t", "bt", Some(1L))
    }
    val ln = Seq((1L, 1L, 1L)).toDF("id", "k", "t")
    val rn = Seq((1L, 1L, 1L)).toDF("bk", "bt", "v")
    intercept[IllegalArgumentException] {
      AsofJoin(ln, rn, "k", "bk", "t", "bt", Some(-1L))
    }
  }

  test("independent-sides variant: native equals composed (probe=events, build=orders)") {
    val native = AsofQueries.joinAsofOrdersNative(spark, sfDir).collect().toSeq
    val composed = AsofQueries.joinAsofOrdersComposed(spark, sfDir).collect().toSeq
    assert(native.nonEmpty)
    assert(native == composed)
    // the match must genuinely interleave: some events matched, some not
    assert(native.exists(_.getLong(3) >= 0))
  }

  test("string keys merge in UTF8 binary order (typed comparator path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // keys deliberately include non-ASCII + prefix-of-each-other cases,
    // where UTF8 binary order and UTF-16 String order can disagree
    val keys = Vector("a", "ab", "b", "ü", "α", "z0", "z")
    val probe = Seq.tabulate(200)(i =>
      (i.toLong, keys(rnd.nextInt(keys.length)), rnd.nextInt(40).toLong))
    val build = rnd.shuffle(
      (for (k <- keys; t <- 0L until 40L if rnd.nextDouble() < 0.2)
        yield (k, t, s"$k@$t")))
    val got = AsofJoin(probe.toDF("id", "k", "t"), build.toDF("bk", "bt", "v"),
        "k", "bk", "t", "bt")
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val byKey = build.groupBy(_._1)
    val want = probe.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Vector.empty).filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got == want)
  }

  test("double event times merge correctly (typed comparator path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val probe = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextDouble() * 10))
    val build = rnd.shuffle(
      (for (k <- 0L until 5L; j <- 0 until 25)
        yield (k, rnd.nextDouble() * 10, k * 1000 + j)))
      // unique (key, time): duplicate double times would be ambiguous
      .distinctBy(b => (b._1, b._2))
    val got = AsofJoin(probe.toDF("id", "k", "t"), build.toDF("bk", "bt", "v"),
        "k", "bk", "t", "bt")
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val byKey = build.groupBy(_._1)
    val want = probe.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Vector.empty).filter(_._2 <= t)
        .maxByOption(_._2).map(_._3).getOrElse(-1L)
    }.toMap
    assert(got == want)
  }

  test("unsupported key type fails at build time") {
    import spark.implicits._
    val l = Seq((Array(1.toByte), 1L)).toDF("k", "t") // binary key
    val r = Seq((Array(1.toByte), 1L, 2L)).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("not supported"), e.getMessage)
  }

  test("mismatched key/time types fail at build time, not mid-merge") {
    import spark.implicits._
    val l = Seq((1, 1L)).toDF("k", "t")   // k: int
    val r = Seq((1L, 1L, 2L)).toDF("rk", "rt", "v") // rk: long
    val e = intercept[IllegalArgumentException] {
      AsofJoin(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("key types differ"), e.getMessage)
  }

  test("self-lineage sides (build derived from probe) do not collide") {
    import spark.implicits._
    val base = Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 1L, 30L))
      .toDF("k", "t", "v")
    // build = aggregate OF the probe plan — shared scan lineage
    val daily = base.groupBy("k", "t").agg(sum("v").as("s"))
      .select(col("k").as("rk"), col("t").as("rt"), col("s"))
    val out = AsofJoin(base, daily, "k", "rk", "t", "rt")
      .select(col("k"), col("t"), col("s")).orderBy("k", "t").collect()
    assert(out.length == 3)
    assert(out.forall(!_.isNullAt(2))) // every row finds its own aggregate
  }

  test("nearest composition picks the minimal |gap| with backward tie preference") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.AsofQueries.joinAsofNearestComposed(spark, sfDir).collect()
    assert(out.nonEmpty)
    // replay: per user the set of daily r_days; per event the true nearest
    val ord = graft.ops.Tables.orders(spark, sfDir)
      .select((col("o_custkey") % 150).as("c"),
        dayofmonth(col("o_orderdate")).cast("long").as("rd"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    out.foreach { r =>
      val (uid, day, dir, gap) =
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))
      ord.get(uid) match {
        case None | Some(Seq()) => assert(dir == "none" && gap == -1L)
        case Some(ds) =>
          val minGap = ds.map(rd => math.abs(rd - day)).min
          assert(gap == minGap, s"event ${r.getLong(0)}: gap $gap != $minGap")
          val hasBack = ds.exists(rd => rd <= day && day - rd == minGap)
          assert(dir == (if (hasBack) "backward" else "forward"),
            s"event ${r.getLong(0)}: direction $dir")
      }
    }
  }
}
