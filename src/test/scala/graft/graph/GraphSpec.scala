package graft.graph

import graft.SparkSpecBase
import graft.llm.Dedup
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  // customer 1: s1 → s1 → s2 → s1 (collapse the repeat, two transitions)
  // customer 2: s2 → s3            (one transition)
  // customer 3: s1 only            (no transition)
  private lazy val lineitem = Seq(
    (101L, 1, 1L), (101L, 2, 1L), (102L, 1, 2L), (103L, 1, 1L),
    (201L, 1, 2L), (202L, 1, 3L),
    (301L, 1, 1L)
  ).toDF("l_orderkey", "l_linenumber", "l_suppkey")

  private lazy val orders = Seq(
    (101L, 1L, ts("2020-01-01")), (102L, 1L, ts("2020-02-01")), (103L, 1L, ts("2020-03-01")),
    (201L, 2L, ts("2020-01-05")), (202L, 2L, ts("2020-01-06")),
    (301L, 3L, ts("2020-01-01"))
  ).toDF("o_orderkey", "o_custkey", "o_orderdate")

  test("supplierTransitions: consecutive pairs per customer, same-supplier runs collapse") {
    val edges = Graph.supplierTransitions(lineitem, orders)
      .orderBy("src", "dst").as[(Long, Long, Double)].collect()
    assert(edges.toSeq == Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (2L, 3L, 1.0)))
  }

  test("supplierTransitions: duplicate (orderkey, linenumber) rows order by supplier") {
    // two identical sort keys with suppliers 5 and 4 → the 4 comes first
    val li = Seq((1L, 1, 5L), (1L, 1, 4L)).toDF("l_orderkey", "l_linenumber", "l_suppkey")
    val od = Seq((1L, 9L, ts("2020-01-01"))).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val edges = Graph.supplierTransitions(li, od).as[(Long, Long, Double)].collect()
    assert(edges.toSeq == Seq((4L, 5L, 1.0)))
  }

  test("transitionMatrix: P(dst|src) normalizes per src") {
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 2.0)).toDF("src", "dst", "w")
    val m = Graph.transitionMatrix(edges).orderBy("src", "dst")
      .select("src", "dst", "p").as[(Long, Long, Double)].collect()
    assert(m.toSeq == Seq((1L, 2L, 0.75), (1L, 3L, 0.25), (2L, 1L, 1.0)))
  }

  test("degrees: in/out degree and strength, sources/sinks keep rows") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val edges = Seq((1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 3L, 4.0)).toDF("src", "dst", "w")
    val d = Graph.degrees(nodes, edges).orderBy("node")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(d.toSeq == Seq(
      (1L, 2L, 0L, 3.0, 0.0), (2L, 1L, 1L, 4.0, 2.0),
      (3L, 0L, 2L, 0.0, 5.0), (4L, 0L, 0L, 0.0, 0.0)))
  }

  /** Independent driver-side power iteration with the same semantics. */
  private def pagerankLocal(nodes: Seq[Long], edges: Seq[(Long, Long, Double)],
                            iters: Int, d: Double): Map[Long, Double] = {
    val n = nodes.size.toDouble
    val wout = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(wout.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w / wout(s) }.sum).toMap
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("pagerank matches an independent local power iteration (incl. dangling)") {
    // 4 nodes; node 4 is dangling (no out-edges); weighted edges
    val nodesSeq = Seq(1L, 2L, 3L, 4L)
    val edgesSeq = Seq((1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 4L, 5.0))
    val expected = pagerankLocal(nodesSeq, edgesSeq, iters = 15, d = 0.85)
    val got = Graph.pagerank(nodesSeq.toDF("node"), edgesSeq.toDF("src", "dst", "w"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-12, s"node $k") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "ranks sum to 1")
  }

  test("pagerank copartition ≡ broadcast (incl. dangling + personalized teleport)") {
    val nodesSeq = Seq(1L, 2L, 3L, 4L, 5L)
    val edgesSeq = Seq((1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 4L, 5.0),
      (4L, 2L, 1.0))
    val nodes = nodesSeq.toDF("node")
    val edges = edgesSeq.toDF("src", "dst", "w")
    for (tp <- Seq(None, Some(3L))) {
      val bc = Graph.pagerank(nodes, edges, teleportTo = tp)
        .as[(Long, Double)].collect().toMap
      val cp = Graph.pagerank(nodes, edges, teleportTo = tp, copartition = true)
        .as[(Long, Double)].collect().toMap
      assert(bc.keySet == cp.keySet)
      bc.foreach { case (k, v) => assert(math.abs(v - cp(k)) < 1e-12, s"node $k tp=$tp") }
    }
    // the copartitioned contrib join must not broadcast the rank vector:
    // the share table is hash(src)-partitioned once and the round joins
    // are shuffled-hash — a broadcast there is the scale ceiling this
    // path exists to remove. (The final node-spine lift is outside the
    // loop and node-sized either way.)
    val local = pagerankLocal(nodesSeq, edgesSeq, iters = 15, d = 0.85)
    val got = Graph.pagerank(nodes, edges, copartition = true)
      .as[(Long, Double)].collect().toMap
    local.foreach { case (k, v) => assert(math.abs(v - got(k)) < 1e-12, s"node $k") }
  }

  test("copartitioned round join: checkpoint keeps hash layout, no exchange, no broadcast") {
    // the exact shape pagerank(copartition = true) runs per round: share
    // hash(src)-partitioned + persisted, ranks hash(node)-partitioned +
    // localCheckpoint'ed. localCheckpoint must PRESERVE outputPartitioning
    // (LogicalRDD carries it) so the shuffled-hash join satisfies both
    // sides' distributions with ZERO new exchanges — that property is the
    // entire point of the 100×-scale path, so pin it.
    val share = (1L to 200L).map(i => (i % 20, i % 7, 1.0))
      .toDF("src", "dst", "share").repartition(col("src")).persist()
    val ranks = (0L to 19L).map(i => (i, 0.05)).toDF("node", "r")
      .repartition(col("node")).localCheckpoint()
    try {
      val j = share.join(ranks.hint("shuffle_hash"), share("src") === ranks("node"))
        .groupBy(col("dst")).agg(sum(col("share") * col("r")).as("contrib"))
      j.collect() // finalize AQE
      val plan = j.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("ShuffledHashJoin"), s"expected shuffled-hash join:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"rank vector must not broadcast on the copartitioned path:\n$plan")
      // the ONLY exchange Spark had to INSERT is the contrib aggregate's
      // hash(dst) — neither join input re-shuffles. (The share cache's
      // stored build plan prints its one-time REPARTITION_BY_COL exchange
      // inside the InMemoryRelation; that's the deliberate one-off cost,
      // not a per-round one, so count only ENSURE_REQUIREMENTS.)
      val inserted = "ENSURE_REQUIREMENTS".r.findAllIn(plan).size
      assert(inserted == 1, s"expected only the dst aggregate exchange, got $inserted:\n$plan")
      assert("Exchange hashpartitioning\\(dst".r.findAllIn(plan).size == 1, plan)
    } finally share.unpersist()
  }

  test("pagerank skew: planted 100×-median hot node — map-side partial agg absorbs the hot key") {
    // ring of 200 (every node in-degree 1, the median) + an edge from
    // every ring node into node 0: in-degree(0) = 200 = 200× median —
    // the dd8-style planted pathology for the per-round contrib shuffle,
    // where all of the hot node's mass keys to ONE dst
    val nodesSeq = (0L to 200L).toSeq
    val ring = (1L to 200L).map(i => (i, if (i == 200L) 1L else i + 1, 1.0))
    val spokes = (1L to 200L).map(i => (i, 0L, 1.0))
    val nodes = nodesSeq.toDF("node")
    val edges = (ring ++ spokes).toDF("src", "dst", "w")
    // correctness under skew: both delivery modes match the local power
    // iteration exactly (node 0 is also dangling — no out-edges)
    val local = pagerankLocal(nodesSeq, ring ++ spokes, iters = 15, d = 0.85)
    for (cp <- Seq(false, true)) {
      val got = Graph.pagerank(nodes, edges, copartition = cp)
        .as[(Long, Double)].collect().toMap
      assert(got.keySet == local.keySet)
      local.foreach { case (k, v) =>
        assert(math.abs(v - got(k)) < 1e-12, s"node $k cp=$cp") }
    }
    // plan pin on the loop's own stage (pagerankContribAudit builds it
    // through the same contribOf the rounds run): the groupBy(dst) sum
    // must PARTIAL-aggregate before its exchange, so each map task folds
    // its slice of the hot key to one row and the final aggregate
    // receives at most one row per task per key — never the raw
    // in-degree. That property, not luck, is what bounds the hot node's
    // reduce-side state at 100×. HITS' half-steps and label
    // propagation's (nd, label) count are the same algebraic
    // groupBy-sum/count shape and inherit the same absorption.
    for (cp <- Seq(false, true)) {
      val audit = Graph.pagerankContribAudit(nodes, edges, copartition = cp)
      audit.collect() // finalize AQE
      val plan = audit.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("partial_sum"),
        s"no map-side partial aggregation (cp=$cp):\n$plan")
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"expected partial+final hash aggregates (cp=$cp):\n$plan")
      assert(plan.contains("Exchange hashpartitioning(dst"),
        s"missing the dst aggregate exchange (cp=$cp):\n$plan")
      if (cp) assert(!plan.contains("BroadcastExchange"),
        s"copartitioned audit must not broadcast the rank vector:\n$plan")
    }
  }

  test("hits + labelPropagation skew: planted 200×-median hot node — partial agg absorbs, both modes exact") {
    // same planted pathology as the pagerank skew pin: ring of 200
    // (median in-degree 1) + a spoke from every ring node into node 0
    val nodesSeq = (0L to 200L).toSeq
    val ring = (1L to 200L).map(i => (i, if (i == 200L) 1L else i + 1, 1.0))
    val spokes = (1L to 200L).map(i => (i, 0L, 1.0))
    val es = ring ++ spokes
    val nodes = nodesSeq.toDF("node")
    val edges = es.toDF("src", "dst", "w")

    // local HITS mirror (Graph.hits arithmetic: inner-join contribs, L1
    // normalize over the contrib rows, absent nodes lift to 0.0)
    def hitsLocal(iters: Int): Map[Long, (Double, Double)] = {
      var hub = nodesSeq.map(_ -> 1.0).toMap
      var auth = Map.empty[Long, Double]
      for (_ <- 1 to iters) {
        val ac = es.groupBy(_._2).map { case (d, g) =>
          d -> g.map(e => e._3 * hub(e._1)).sum }
        val s1 = ac.values.sum
        auth = nodesSeq.map(n => n -> (ac.getOrElse(n, 0.0) / s1)).toMap
        val hc = es.groupBy(_._1).map { case (s0, g) =>
          s0 -> g.map(e => e._3 * auth(e._2)).sum }
        val s2 = hc.values.sum
        hub = nodesSeq.map(n => n -> (hc.getOrElse(n, 0.0) / s2)).toMap
      }
      nodesSeq.map(n => n -> ((hub(n), auth(n)))).toMap
    }
    // local synchronous LP mirror (vote = summed incident weight per
    // neighbor label; max weight, ties to the smallest label)
    def lpLocal(iters: Int): Map[Long, Long] = {
      val und = es.flatMap(e => Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
        .groupBy(e => (e._1, e._2))
        .map { case ((s0, d), g) => (s0, d, g.map(_._3).sum) }.toSeq
      var lab = nodesSeq.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        val votes = und.groupBy(_._1).map { case (n, g) =>
          val byLabel = g.groupBy(e => lab(e._2))
            .map { case (l, gg) => (l, gg.map(_._3).sum) }
          n -> byLabel.toSeq.sortBy { case (l, wv) => (-wv, l) }.head._1
        }
        lab = nodesSeq.map(n => n -> votes.getOrElse(n, n)).toMap
      }
      lab
    }

    val hitsRef = hitsLocal(8)
    val lpRef = lpLocal(6)
    for (cp <- Seq(false, true)) {
      val h = Graph.hits(nodes, edges, iters = 8, copartition = cp)
        .as[(Long, Double, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
      assert(h.keySet == hitsRef.keySet)
      hitsRef.foreach { case (k, (hb, au)) =>
        assert(math.abs(h(k)._1 - hb) < 1e-12, s"hub $k cp=$cp")
        assert(math.abs(h(k)._2 - au) < 1e-12, s"auth $k cp=$cp")
      }
      val l = Graph.labelPropagation(nodes, edges, iters = 6, copartition = cp)
        .as[(Long, Long)].collect().toMap
      assert(l === lpRef, s"labelPropagation cp=$cp")
    }

    // plan pins through the loops' OWN stage constructions: every hot-key
    // shuffle (both HITS half-steps, the LP (nd, label) vote sum and its
    // argmax) must PARTIAL-aggregate map-side before its exchange —
    // previously this was inherited from the pagerank pin by argument
    // only; now each loop's audited plan asserts it directly
    for (cp <- Seq(false, true)) {
      val (ac, hc) = Graph.hitsHalfStepAudit(nodes, edges, copartition = cp)
      for ((df, nm) <- Seq((ac, "auth"), (hc, "hub"))) {
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert(plan.contains("partial_sum"),
          s"no map-side partial aggregation in HITS $nm step (cp=$cp):\n$plan")
        assert("HashAggregate".r.findAllIn(plan).size >= 2,
          s"expected partial+final hash aggregates in HITS $nm step (cp=$cp):\n$plan")
        if (cp) assert(!plan.contains("BroadcastExchange"),
          s"copartitioned HITS $nm step must not broadcast the vector:\n$plan")
      }
      val vote = Graph.lpVoteAudit(nodes, edges, copartition = cp)
      vote.collect()
      val plan = vote.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("partial_sum"),
        s"no map-side partial vote aggregation (cp=$cp):\n$plan")
      assert(plan.contains("partial_max"),
        s"no map-side partial argmax (cp=$cp):\n$plan")
      if (cp) assert(!plan.contains("BroadcastExchange"),
        s"copartitioned LP vote must not broadcast the label vector:\n$plan")
    }
  }

  test("pagerank: symmetric cycle is uniform") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0)).toDF("src", "dst", "w")
    val r = Graph.pagerank(nodes, edges).as[(Long, Double)].collect()
    r.foreach { case (_, v) => assert(math.abs(v - 1.0 / 3) < 1e-12) }
  }

  test("coEmploymentSimilarity: Jaccard over shared people, minShared prunes") {
    val m = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "C"),
      (1L, "A") // duplicate membership row must not double-count
    ).toDF("person", "company")
    val r = Graph.coEmploymentSimilarity(m, "person", "company", minShared = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("A", "B", 2L, 3L, 2L, 0.666667)))
    val all = Graph.coEmploymentSimilarity(m, "person", "company", minShared = 1)
      .orderBy("c", "c2")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(all.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq(("A", "B", 2L), ("A", "C", 1L)))
  }

  test("bfsHops: shortest hop counts, unreachable stays null") {
    // 1 → 2 → 3 → 4 and a shortcut 1 → 3; node 5 unreachable; 4 → 1 cycle
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    val d = Graph.bfsHops(nodes, edges, seed = 1L).orderBy("node")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(d.toSeq == Seq(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> -1))
  }

  test("bfsHops: empty seed (seed not in nodes) leaves everything null") {
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val d = Graph.bfsHops(nodes, edges, seed = 9L)
      .collect().map(r => r.isNullAt(1))
    assert(d.forall(identity))
  }

  test("strong-ties components fragment when weak edges are cut") {
    // two clusters {1,2} and {3,4} linked by a weak edge 2→3
    val edges = Seq((1L, 2L, 9.0), (2L, 1L, 9.0), (3L, 4L, 9.0), (4L, 3L, 9.0),
      (2L, 3L, 1.0)).toDF("src", "dst", "w")
    val strong = Graph.transitionMatrix(edges).filter(col("p") >= 0.5).select("src", "dst")
    val comps = Dedup.labelComponents(Seq(1L, 2L, 3L, 4L).toDF("node"), "node", strong)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: per-node counts and clustering on K4 minus an edge") {
    // edges 1-2,1-3,2-3,2-4,3-4 → triangles {1,2,3} and {2,3,4}; fed with
    // reversed duplicates and a self loop to prove normalization
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 3L), (2L, 2L)).toDF("src", "dst")
    val r = Graph.triangles(edges).orderBy("node").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r === Array(
      (1L, 1L, 2L, 1.0), (2L, 2L, 3L, 0.666667),
      (3L, 2L, 3L, 0.666667), (4L, 1L, 2L, 1.0)))
  }

  test("triangles: triangle-free graph and isolated-pair degrees") {
    // a path 1-2-3 plus a detached edge 4-5: zero triangles everywhere
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val r = Graph.triangles(edges).orderBy("node").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r === Array(
      (1L, 0L, 1L, 0.0), (2L, 0L, 2L, 0.0), (3L, 0L, 1L, 0.0),
      (4L, 0L, 1L, 0.0), (5L, 0L, 1L, 0.0)))
  }

  test("kcore: peeling cascades through a tail, keeps the clique") {
    val s = spark; import s.implicits._
    // K4 {1,2,3,4} (the 3-core) + tail 4-5-6-7: 7 peels first, which
    // drops 6 below degree 1... each tail node has degree <3 so the whole
    // tail peels in round one EXCEPT the cascade check: give 5 two tail
    // neighbors so it only peels after they do
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L)).toDF("src", "dst")
    val nodes = (1L to 7L).toDF("node")
    val r = Graph.kcore(nodes, edges, k = 3).orderBy("node").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
    // {5,6,7} form a triangle but every member has degree <3 after 4-5 is
    // peeled... 5 has neighbors {4,6,7} = degree 3, 6/7 have degree 2 →
    // 6,7 peel round one, then 5 loses them and peels: only K4 survives
    assert(r === Array(
      (1L, 3L, true), (2L, 3L, true), (3L, 3L, true), (4L, 3L, true),
      (5L, 0L, false), (6L, 0L, false), (7L, 0L, false)))
    // fixpoint invariant: every surviving node meets the core threshold
    assert(r.filter(_._3).forall(_._2 >= 3))
  }

  test("labelPropagation: two cliques joined by a weak bridge separate") {
    val s = spark; import s.implicits._
    // triangles {1,2,3} and {4,5,6} with heavy internal edges, one
    // weight-1 bridge 3-4; isolated node 7 keeps its own label
    val edges = Seq(
      (1L, 2L, 5.0), (1L, 3L, 5.0), (2L, 3L, 5.0),
      (4L, 5L, 5.0), (4L, 6L, 5.0), (5L, 6L, 5.0),
      (3L, 4L, 1.0)).toDF("src", "dst", "w")
    val r = Graph.labelPropagation((1L to 7L).toDF("node"), edges, iters = 6)
      .orderBy("node").collect().map(x => (x.getLong(0), x.getLong(1)))
    val byNode = r.toMap
    assert(Set(byNode(1L), byNode(2L), byNode(3L)).size === 1)
    assert(Set(byNode(4L), byNode(5L), byNode(6L)).size === 1)
    assert(byNode(1L) !== byNode(4L))
    assert(byNode(7L) === 7L)
  }

  test("hits + labelPropagation: copartition ≡ broadcast") {
    val s = spark; import s.implicits._
    val edges = Seq(
      (1L, 2L, 5.0), (1L, 3L, 5.0), (2L, 3L, 5.0),
      (4L, 5L, 5.0), (4L, 6L, 5.0), (5L, 6L, 5.0),
      (3L, 4L, 1.0), (6L, 1L, 2.0)).toDF("src", "dst", "w")
    val nodes = (1L to 7L).toDF("node")
    val lpaB = Graph.labelPropagation(nodes, edges, iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val lpaC = Graph.labelPropagation(nodes, edges, iters = 6, copartition = true)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(lpaB === lpaC)
    val hB = Graph.hits(nodes, edges, iters = 5)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    val hC = Graph.hits(nodes, edges, iters = 5, copartition = true)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(hB.keySet === hC.keySet)
    hB.foreach { case (k, (hub, auth)) =>
      assert(math.abs(hub - hC(k)._1) < 1e-12 && math.abs(auth - hC(k)._2) < 1e-12,
        s"node $k")
    }
  }

  test("labelPropagation: tie votes pick the smallest label") {
    val s = spark; import s.implicits._
    // node 3 hears labels 1 and 2 with equal weight → adopts 1
    val edges = Seq((1L, 3L, 2.0), (2L, 3L, 2.0)).toDF("src", "dst", "w")
    val r = Graph.labelPropagation((1L to 3L).toDF("node"), edges, iters = 1)
      .orderBy("node").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r(2) === (3L, 1L))
  }

  test("hits: star sinks get the authority, spokes get the hubs") {
    val s = spark; import s.implicits._
    // 1,2,3 all point at 9 (equal weight) → 9 is the sole authority,
    // the three spokes share hub mass equally; both vectors L1 = 1
    val edges = Seq((1L, 9L, 1.0), (2L, 9L, 1.0), (3L, 9L, 1.0)).toDF("src", "dst", "w")
    val r = Graph.hits(Seq(1L, 2L, 3L, 9L).toDF("node"), edges, iters = 3)
      .orderBy("node").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
    val byNode = r.map(t => t._1 -> (t._2, t._3)).toMap
    assert(math.abs(byNode(9L)._2 - 1.0) < 1e-12) // all authority
    assert(math.abs(byNode(9L)._1) < 1e-12)       // no hub mass
    Seq(1L, 2L, 3L).foreach { n =>
      assert(math.abs(byNode(n)._1 - 1.0 / 3) < 1e-12)
      assert(math.abs(byNode(n)._2) < 1e-12)
    }
    assert(math.abs(r.map(_._2).sum - 1.0) < 1e-9)
    assert(math.abs(r.map(_._3).sum - 1.0) < 1e-9)
  }

  test("hits: weighted chain favors the heavier edge's endpoint") {
    val s = spark; import s.implicits._
    // 1→2 (w 3) and 1→3 (w 1): node 2 must out-rank node 3 in authority
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0)).toDF("src", "dst", "w")
    val r = Graph.hits(Seq(1L, 2L, 3L).toDF("node"), edges, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(2L) > r(3L) && r(3L) > 0.0)
  }

  test("summary: density, reciprocity, and assortativity on a known graph") {
    val s = spark; import s.implicits._
    // 1↔2 reciprocal, 1→3 one-way: 3 directed edges over 3 nodes.
    // density = 3/6; reciprocity = 2/3; undirected star degrees
    // (2,1,1) → assortativity = Pearson over {(2,1),(1,2),(2,1),(1,2)} = −1
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.summary((1L to 3L).toDF("node"), edges).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 0.666667)
    assert(r.getDouble(4) === -1.0)
  }

  test("summary: regular graph leaves assortativity undefined (null)") {
    val s = spark; import s.implicits._
    // a 3-cycle: every degree 2 → zero variance → NULL, not NaN
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.summary((1L to 3L).toDF("node"), edges).head()
    assert(r.isNullAt(4))
    assert(r.getDouble(3) === 0.0) // no reciprocal directed edges
  }

  test("kcore: k=2 keeps any cycle, empty graph yields no core") {
    val s = spark; import s.implicits._
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.kcore((1L to 4L).toDF("node"), cyc, k = 2).orderBy("node")
      .collect().map(x => (x.getLong(0), x.getBoolean(2)))
    assert(r === Array((1L, true), (2L, true), (3L, true), (4L, false)))
    val none = Graph.kcore((1L to 3L).toDF("node"),
        Seq((1L, 2L)).toDF("src", "dst"), k = 2)
      .filter(col("in_core")).count()
    assert(none === 0L)
  }
}
