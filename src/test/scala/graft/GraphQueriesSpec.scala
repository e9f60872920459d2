package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariant + differential tests for the graph / SCD2 / OHLC operators. */
class GraphQueriesSpec extends SparkTestBase {

  test("triangle counts match a naive id-ordered enumeration") {
    // Independent reformulation: enumerate triangles with the simple
    // a<b<c orientation (the oracle's shape) and compare per-vertex
    // counts with the degree-ordered production implementation.
    val li = ops.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= ops.GraphQueries.MinSupport)
      .select("u", "v")
    val e1 = edges.select(col("u").as("a"), col("v").as("b"))
    val e2 = edges.select(col("u").as("b"), col("v").as("c"))
    val e3 = edges.select(col("u").as("a"), col("v").as("c"))
    val tris = e1.join(e2, Seq("b")).join(e3, Seq("a", "c"))
    val naive = tris.select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("v")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val prod = SparkEntry.queries("graph_triangle_count")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(prod.nonEmpty)
    assert(prod == naive)
    ops.PipelineCache.releaseAll()
  }

  test("triangle plan has no cartesian product") {
    val plan = SparkEntry.queries("graph_triangle_count")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    ops.PipelineCache.releaseAll()
  }

  test("pagerank iteration conserves rank mass") {
    val rows = SparkEntry.queries("graph_pagerank_iter")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // no dangling mass: one damped iteration over a dangling-free graph
    // redistributes everything, so Σ rank = 1 up to fp accumulation
    val mass = rows.map(_._3).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"rank mass $mass")
    // every rank is at least the teleport floor 0.15/N
    val n = rows.length
    assert(rows.forall(_._3 >= 0.15 / n - 1e-12))
    ops.PipelineCache.releaseAll()
  }

  test("minhash estimate rows cover the verified near-dup pairs exactly") {
    val err = SparkEntry.queries("dedup_minhash_error")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(err.nonEmpty)
    // estimates are multiples of 1/8 in [0,1]; abs_err consistent
    err.values.foreach { case (est, _) =>
      assert(est >= 0.0 && est <= 1.0 && (est * 8) == math.round(est * 8).toDouble)
    }
    // every verified LSH pair appears among the candidates with the
    // same exact Jaccard (the verify filter is jaccard >= 0.8)
    val verified = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(verified.nonEmpty)
    verified.foreach { case (pair, j) =>
      assert(err.contains(pair), s"verified pair $pair missing")
      assert(err(pair)._2 == j, s"jaccard mismatch for $pair")
      assert(j >= 0.8)
    }
    ops.PipelineCache.releaseAll()
  }

  test("scd2 merge: version invariants hold for every key") {
    val rows = SparkEntry.queries("etl_scd2_merge")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, vs) =>
      // exactly one open (current) version per key
      assert(vs.count(_._5) == 1, s"key $k: ${vs.count(_._5)} current rows")
      assert(vs.length <= 2, s"key $k: ${vs.length} versions")
      if (vs.length == 2) {
        // a closed v0 + an open v1, and the update changed the value
        val closed = vs.find(!_._5).get
        val open = vs.find(_._5).get
        assert(closed._3 == 0 && open._3 == 1)
        assert(closed._2 != open._2, s"key $k: no-op update emitted 2 versions")
      }
      assert(vs.forall(_._4 == 9999))
    }
    // branch totals match first-principles membership counts
    val o = ops.Tables.orders(spark, sfDir).select(col("o_orderkey"),
      col("o_orderstatus")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cur = o.filter(_._1 % 2 == 0).toMap
    val inc = o.filter(_._1 % 3 == 0)
      .map { case (k, st) => k -> (if (k % 5 == 0) "X" else st) }.toMap
    val nUpdated = cur.count { case (k, st) => inc.get(k).exists(_ != st) }
    val nInserted = inc.count { case (k, _) => !cur.contains(k) }
    assert(rows.count(!_._5) == nUpdated)
    assert(rows.count(r => r._3 == 1 && r._5) == nUpdated + nInserted)
    assert(rows.length == cur.size + nInserted + nUpdated)
  }

  test("bfs reach matches an in-memory BFS over the collected graph") {
    // independent third implementation: collect the small support graph
    // and run textbook queue BFS in Scala, then compare layer sizes
    val li = ops.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= ops.GraphQueries.MinSupport)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) ::= v; adj(v) ::= u }
    val verts = adj.keySet
    val depth = scala.collection.mutable.Map.empty[Long, Int]
    var frontier = verts.filter(_ % 20 == 0).toList
    frontier.foreach(x => depth(x) = 0)
    for (r <- 1 to 3) {
      frontier = frontier.flatMap(adj).distinct.filterNot(depth.contains)
      frontier.foreach(x => depth(x) = r)
    }
    val expected = (verts.toSeq.map(x => depth.getOrElse(x, -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap)
    val prod = SparkEntry.queries("graph_bfs_reach")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(prod.nonEmpty)
    assert(prod == expected, s"prod=$prod expected=$expected")
    ops.PipelineCache.releaseAll()
  }

  test("neighbor jaccard matches naive set arithmetic on the collected graph") {
    val li = ops.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= ops.GraphQueries.MinSupport)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbr = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) => nbr(u) += v; nbr(v) += u }
    val prod = SparkEntry.queries("graph_jaccard_neighbors")(spark, sfDir)
      .collect()
    assert(prod.length == 20)
    prod.foreach { r =>
      val (u, v) = (r.getLong(0), r.getLong(1))
      val inter = (nbr(u) & nbr(v)).size
      val union = (nbr(u) | nbr(v)).size
      assert(r.getLong(2) == inter, s"($u,$v) common")
      assert(r.getLong(3) == nbr(u).size && r.getLong(4) == nbr(v).size,
        s"($u,$v) degrees")
      assert(r.getDouble(5) == inter.toDouble / union, s"($u,$v) jaccard")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
    ops.PipelineCache.releaseAll()
  }

  test("pagerank sum form agrees with the bit-stable ordered fold within ulps") {
    // the registered query is the production partial-aggregated sum;
    // the ordered fold is the deterministic reference — they must agree
    // to far tighter than the registered round(12) granularity
    val sumForm = SparkEntry.queries("graph_pagerank_iter")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val foldForm = ops.GraphQueries.graphPagerankIterFold(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sumForm.nonEmpty && sumForm.keySet == foldForm.keySet)
    sumForm.foreach { case (k, pr) =>
      assert(math.abs(pr - foldForm(k)) < 1e-12, s"vertex $k: $pr vs ${foldForm(k)}")
    }
    ops.PipelineCache.releaseAll()
  }

  test("converged pagerank: fixpoint property, mass conservation, round count") {
    val rows = SparkEntry.queries("graph_pagerank_converged")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val nRounds = rows.head._3
    assert(rows.forall(_._3 == nRounds) && nRounds >= 2,
      s"expected a uniform multi-round count, got $nRounds")
    assert(nRounds < ops.GraphQueries.PrMaxRounds, "fixture must converge under the cap")
    val mass = rows.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass")
    // fixpoint check: one more plain-Scala iteration over the collected
    // graph moves every rank by less than the convergence tolerance
    val li = ops.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= ops.GraphQueries.MinSupport)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) ::= v; adj(v) ::= u }
    val n = adj.size
    val pr = rows.map(r => r._1 -> r._2).toMap
    val tol = ops.GraphQueries.PrRelTol / n
    adj.keys.foreach { v =>
      val next = 0.15 / n + 0.85 * adj(v).map(u => pr(u) / adj(u).size).sum
      // the collected ranks are rounded to 9 decimals, so allow that on
      // top of the loop's own tolerance
      assert(math.abs(next - pr(v)) < tol + 1e-8, s"vertex $v not at fixpoint")
    }
    ops.PipelineCache.releaseAll()
  }

  test("converged pagerank early-exits on a uniform graph and warns at the cap") {
    import spark.implicits._
    // 4-cycle: every vertex has degree 2 — uniform ranks are already the
    // fixpoint, so round 1's delta is 0 and the loop exits immediately
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val dir = cyc.toDF("src", "dst")
      .unionAll(cyc.map(_.swap).toDF("src", "dst"))
    val adj = dir.join(dir.groupBy("src").agg(count(lit(1)).as("deg")), "src")
    val verts = dir.select(col("src").as("x")).distinct()
    val fast = ops.GraphQueries.pagerankConvergedOnAdjacency(
      adj, verts, relTol = 0.05, maxRounds = 45).collect()
    assert(fast.forall(_.getInt(2) == 1), "uniform graph must converge in 1 round")
    assert(fast.forall(r => math.abs(r.getDouble(1) - 0.25) < 1e-9))
    // path graph (unequal degrees): rank moves every round, so a cap of
    // 1 must trip the loud warning
    val path = Seq((1L, 2L), (2L, 3L))
    val pdir = path.toDF("src", "dst")
      .unionAll(path.map(_.swap).toDF("src", "dst"))
    val padj = pdir.join(pdir.groupBy("src").agg(count(lit(1)).as("deg")), "src")
    val pverts = pdir.select(col("src").as("x")).distinct()
    val errBuf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    val capped = try {
      System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
      ops.GraphQueries.pagerankConvergedOnAdjacency(
        padj, pverts, relTol = 0.0001, maxRounds = 1).collect()
    } finally System.setErr(realErr)
    assert(capped.forall(_.getInt(2) == 1))
    assert(errBuf.toString("UTF-8").contains("reached before convergence"),
      s"expected the cap-trip warning, got: ${errBuf.toString("UTF-8").take(200)}")
    // rank mass is conserved even when capped (each reported rank is
    // rounded to 9 decimals, so allow n x 5e-10 of rounding slack)
    assert(math.abs(capped.map(_.getDouble(1)).sum - 1.0) < 1e-8)
  }

  test("bfs run to exhaustion matches an in-memory BFS and labels all reachable depths") {
    val li = ops.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= ops.GraphQueries.MinSupport)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) ::= v; adj(v) ::= u }
    val depth = scala.collection.mutable.Map.empty[Long, Int]
    var frontier = adj.keySet.filter(_ % 20 == 0).toList
    frontier.foreach(x => depth(x) = 0)
    var r = 0
    while (frontier.nonEmpty) {
      r += 1
      frontier = frontier.flatMap(adj).distinct.filterNot(depth.contains)
      frontier.foreach(x => depth(x) = r)
    }
    val expected = adj.keySet.toSeq.map(x => depth.getOrElse(x, -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val prod = SparkEntry.queries("graph_bfs_converged")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(prod.nonEmpty)
    assert(prod == expected, s"prod=$prod expected=$expected")
    ops.PipelineCache.releaseAll()
  }

  test("jaccard middle-degree cap drops hub wedges and is exact when inactive") {
    import spark.implicits._
    // hub vertex 100 neighbors 1..30; plus an isolated triangle 201-202-203.
    // With the cap below 30 the hub cannot serve as a wedge middle, so no
    // pair among 1..30 survives; the triangle's pairs (middle degree 2) do.
    val hubEdges = (1L to 30L).map(i => (100L, i)) ++
      Seq((201L, 202L), (202L, 203L), (201L, 203L))
    val dir = hubEdges.toDF("src", "dst")
      .unionAll(hubEdges.map(_.swap).toDF("src", "dst"))
    val capped = ops.GraphQueries.jaccardOnAdjacency(dir, middleCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.nonEmpty)
    assert(capped.forall { case (u, v) => u >= 200L && v >= 200L },
      s"hub-middled pairs must be pruned, got $capped")
    // with the cap above the hub degree the exact wedge set returns
    val exact = ops.GraphQueries.jaccardOnAdjacency(dir, middleCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.exists { case (u, v) => u < 100L && v < 100L },
      "uncapped run must include hub-middled pairs")
    // and on the hub-free fixture graph the registered cap is a no-op:
    // capped output == fully uncapped output
    val reg = SparkEntry.queries("graph_jaccard_neighbors")(spark, sfDir)
      .collect().map(_.toSeq)
    ops.PipelineCache.releaseAll()
    val uncapped = ops.GraphQueries.jaccardOnAdjacency(
      graftTestAdjacency(), Int.MaxValue).collect().map(_.toSeq)
    assert(reg.toSeq == uncapped.toSeq, "cap must be a no-op on the fixture")
    ops.PipelineCache.releaseAll()
  }

  test("LPA to convergence: self-vote damps the bipartite flip and " +
      "separates cliques") {
    import spark.implicits._
    // 4-cycle — the canonical sync-LPA oscillator (labels flip with
    // period 2 forever without damping): the self-vote variant must
    // fixpoint before the cap, collapsing all four to label 1.
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val cycDir = cyc.toDF("src", "dst")
      .unionAll(cyc.map(_.swap).toDF("src", "dst"))
    val cycVerts = cycDir.select(col("src").as("x")).distinct()
    val r1 = ops.GraphQueries.lpaConvergedOnAdjacency(cycDir, cycVerts, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(r1.forall(_._3 < 10), s"must converge before cap: ${r1.toSeq}")
    assert(r1.forall(_._2 == 1L), s"4-cycle must collapse to 1: ${r1.toSeq}")
    // two triangles joined by a bridge: LPA's density question — the
    // communities must stay SEPARATE (CC would merge them via the
    // bridge, which is exactly the distinction LPA exists to draw)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
    val dir = e.toDF("src", "dst").unionAll(e.map(_.swap).toDF("src", "dst"))
    val verts = dir.select(col("src").as("x")).distinct()
    val r2 = ops.GraphQueries.lpaConvergedOnAdjacency(dir, verts, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 3L).map(r2).toSet == Set(1L) &&
      Seq(4L, 5L, 6L).map(r2).toSet == Set(4L),
      s"triangles must keep distinct communities: $r2")
  }

  /** Fixture support adjacency rebuilt independently for the no-op check. */
  private def graftTestAdjacency() = {
    val li = ops.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= ops.GraphQueries.MinSupport)
      .select("u", "v")
    edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
  }

  test("ohlc open/close match a window first/last reformulation") {
    val ev = ops.Tables.events(spark, sfDir).select(col("event_type"),
      date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("bucket"),
      col("event_id"),
      col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
    val w = Window.partitionBy("event_type", "bucket").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val windowed = ev
      .withColumn("open", first(col("v")).over(w).cast("double"))
      .withColumn("close", last(col("v")).over(w).cast("double"))
      .select("event_type", "bucket", "open", "close").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val prod = SparkEntry.queries("time_resample_ohlc")(spark, sfDir).collect()
    assert(prod.nonEmpty)
    prod.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (open, close) = windowed(key)
      assert(r.getDouble(2) == open, s"$key open")
      assert(r.getDouble(5) == close, s"$key close")
      assert(r.getDouble(3) >= math.max(open, close), s"$key high")
      assert(r.getDouble(4) <= math.min(open, close), s"$key low")
    }
  }

  test("topological layers equal an in-memory longest-path computation") {
    val rows = SparkEntry.queries("graph_topo_layers")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ops.PipelineCache.releaseAll()
    // reference: rebuild the id-oriented support DAG and Bellman-relax
    // over a topological order
    val li = ops.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = li.groupBy(_._1).values.toSeq.flatMap { grp =>
      val ps = grp.map(_._2).sorted.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size)
    val edges = pairCount.filter(_._2 >= ops.GraphQueries.MinSupport).keys.toSeq
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var layer = verts.map(_ -> 0L).toMap
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (u, v) =>
        if (layer(u) + 1 > layer(v)) { layer += v -> (layer(u) + 1); changed = true }
      }
    }
    assert(rows.keySet == verts)
    rows.foreach { case (v, l) =>
      assert(l == layer(v), s"vertex $v: layer $l != ${layer(v)}")
    }
    // the fixture actually has depth (chains exist): max layer >= 3
    assert(rows.values.max >= 3)
  }

  test("recursive CTE climb equals the doubling-loop flatten row for row") {
    // three constructions of the parent-chain relation: doubling loop
    // (graph_hierarchy_flatten), statement-level WITH RECURSIVE
    // (sql_recursive_cte), DuckDB's recursion (its oracle). This pins
    // the engine-vs-engine pair; the oracle gate pins each vs DuckDB.
    val viaLoop = SparkEntry.queries("graph_hierarchy_flatten")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaCte = SparkEntry.queries("sql_recursive_cte")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaCte.nonEmpty)
    assert(viaLoop == viaCte)
  }

  test("recursive CTE leaves the session recursion guard at its default") {
    // r7 advice: the 50M row-limit raise must be scoped to the query's
    // own (eager) materialization — a session-wide raise weakens the
    // runaway guard for every later recursive statement.
    val key = "spark.sql.cteRecursionRowLimit"
    val before = spark.conf.get(key)
    SparkEntry.queries("sql_recursive_cte")(spark, sfDir).collect()
    assert(spark.conf.get(key) == before,
      s"recursion guard leaked: $before -> ${spark.conf.get(key)}")
    assert(before.toLong <= 1000000L,
      s"suite session entered the test with a raised guard ($before)")
  }

  test("hierarchy flatten equals a scala per-node climb and respects the doubling bound") {
    val out = graft.ops.GraphQueries.graphHierarchyFlatten(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val keys = graft.ops.Tables.part(spark, sfDir)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    def parent(k: Long): Long = if (k < 4) k else k / 4
    keys.foreach { k =>
      var cur = k; var d = 0L
      while (parent(cur) != cur) { cur = parent(cur); d += 1 }
      assert(out(k) == ((cur, d)), s"node $k: ${out(k)} != ($cur, $d)")
      assert(d <= 64, s"node $k deeper than the doubling bound")
    }
    assert(out.keySet == keys)
  }

  test("label propagation matches a scala replay of two sync max-count-min-label rounds") {
    val out = graft.ops.GraphQueries.graphLabelPropagation(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the support adjacency naively from lineitem
    val li = graft.ops.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = li.groupBy(_._1).values.toSeq.flatMap { basket =>
      val ps: Seq[Long] = basket.map(_._2).toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size)
    val edges = pairCount.filter(_._2 >= 2).keys.toSeq
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(out.keySet == adj.keySet)
    def step(lbl: Map[Long, Long]): Map[Long, Long] =
      adj.map { case (v, ns) =>
        val counts = ns.groupBy(lbl).view.mapValues(_.size)
        // max count, then smallest label
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    val want = step(step(adj.keys.map(v => v -> v).toMap))
    out.foreach { case (v, c) =>
      assert(c == want(v), s"vertex $v: community $c != replay ${want(v)}")
    }
    // communities actually merge: strictly fewer labels than vertices
    assert(out.values.toSet.size < out.size)
  }

  test("full SCC decomposition matches in-memory mutual reachability") {
    val rows = SparkEntry.queries("graph_scc_full")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ops.PipelineCache.releaseAll()
    // reference: brand-restricted add-next edges rebuilt independently,
    // labels from per-vertex BFS mutual reachability (tiny graph)
    val li = ops.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val brandOf = ops.Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keep = Set("Brand#11", "Brand#23")
    val edges = li.filter(t => keep(brandOf(t._3)))
      .groupBy(t => (t._1, brandOf(t._3))).values.flatMap { grp =>
        val seq = grp.sortBy(t => (t._2, t._3)).map(_._3)
        seq.zip(seq.drop(1)).filter(p => p._1 != p._2)
      }.toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2))
    def reach(adj: Map[Long, Seq[Long]], v0: Long): Set[Long] = {
      var vis = Set(v0); var frontier = Set(v0)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Nil)) -- vis
        vis ++= next; frontier = next
      }
      vis
    }
    val fadj = edges.toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val badj = edges.toSeq.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val want = verts.map { v =>
      val scc = reach(fadj, v) intersect reach(badj, v)
      v -> scc
    }.toMap
    assert(rows.map(_._1).toSet == verts, "every vertex labeled exactly once")
    assert(rows.length == verts.size)
    rows.foreach { case (m, id, sz) =>
      assert(id == want(m).min, s"vertex $m: scc_id $id != ${want(m).min}")
      assert(sz == want(m).size.toLong, s"vertex $m: size $sz != ${want(m).size}")
    }
    // the fixture exercises the RECURSION: >= 2 nontrivial SCCs means
    // at least two FW-BW extractions on successive residual graphs,
    // plus singleton trims
    val byScc = rows.groupBy(_._2)
    assert(byScc.count(_._2.length >= 2) >= 2, s"sizes=${byScc.view.mapValues(_.length).toMap}")
    assert(byScc.count(_._2.length == 1) >= 1)
  }
  test("2-hop HLL sketch tracks the exact cardinality within its bound") {
    // the sketch's target set includes the vertex itself (symmetric
    // graph: x is a neighbor of its neighbors), so exact + 1
    val exact = graft.ops.GraphQueries.graph2HopCard(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val est = graft.ops.GraphQueries.graph2HopCardSketch(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet == exact.keySet, "sketch must cover every vertex")
    val relErrs = exact.map { case (k, n2) =>
      val target = n2 + 1.0
      math.abs(est(k) - target) / target
    }
    // lgK=12 -> rsd ~1.6%; 3 sigma ~4.9%. Small sets are near-exact in
    // HLL++'s sparse mode, so the mean must be far tighter.
    assert(relErrs.max <= 0.05, s"worst rel err ${relErrs.max}")
    assert(relErrs.sum / relErrs.size <= 0.02,
      s"mean rel err ${relErrs.sum / relErrs.size}")
  }
}
