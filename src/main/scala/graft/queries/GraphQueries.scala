package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Graph

/** Link-graph analytics (graft.ops.Graph) — PageRank-style source
  * authority and degree profiling over a bipartite customer↔supplier
  * interaction graph derived from the fixtures (the stand-in for a web
  * crawl's host link graph; SURVEY §2 beyond-reference block).
  *
  * Oracles replay the integer ppb fixpoint exactly: the rank loop is
  * pure 64-bit floor division, so three unrolled CTE rounds in DuckDB
  * reproduce Spark's longs bit-for-bit.
  */
object GraphQueries extends QueryGroup {

  /** Symmetrized bipartite graph: customer c ↔ supplier s iff some
    * lineitem of one of c's orders was supplied by s. Supplier nodes
    * offset by 1e6 into a disjoint id space.
    */
  private def edges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + 1000000L).as("sn"))
      .distinct()
    pairs.select(col("c").as("src"), col("sn").as("dst"))
      .union(pairs.select(col("sn").as("src"), col("c").as("dst")))
  }

  private val sqlEdges =
    """pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS sn
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (SELECT c AS src, sn AS dst FROM pairs
      |  UNION ALL SELECT sn AS src, c AS dst FROM pairs)""".stripMargin

  override def queries: Map[String, Q] = Map(
    // 3-round integer PageRank; top-100 authorities. The heavy
    // suppliers (many distinct customers) float to the top — the
    // host-authority signal corpus pipelines weight sources by.
    "q171_pagerank" -> ((s, d) => {
      Graph.pageRankPpb(edges(s, d), "src", "dst", iterations = 3)
        .orderBy(col("rank_ppb").desc, col("node"))
        .limit(100)
    }),

    // personalized PageRank (NEW r8): teleport mass concentrated on
    // the EUROPE customers — authority RELATIVE to a trusted seed set
    // (TrustRank's shape); unreachable nodes converge to 0
    "q171c_personalized_pagerank" -> ((s, d) => {
      val seeds = Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("c_custkey").as("node"))
      Graph.personalizedPageRankPpb(edges(s, d), "src", "dst",
          seeds, "node", iterations = 3)
        .orderBy(col("rank_ppb").desc, col("node"))
        .limit(100)
    }),

    // edge-WEIGHTED PageRank (NEW r10): rank mass splits across
    // out-edges by interaction count (how many lineitems link the
    // customer and supplier) — the real host-graph form where a
    // 10,000-link endorsement outweighs a single link; still pure
    // floor-integer arithmetic, oracle unrolls 3 rounds bit-for-bit
    "q171d_weighted_pagerank" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"),
          (col("l_suppkey") + 1000000L).as("sn"))
        .agg(count(lit(1)).as("w"))
      val we = pairs.select(col("c").as("src"), col("sn").as("dst"), col("w"))
        .union(pairs.select(col("sn").as("src"), col("c").as("dst"), col("w")))
      Graph.pageRankWeightedPpb(we, "src", "dst", "w", iterations = 3)
        .orderBy(col("rank_ppb").desc, col("node"))
        .limit(100)
    }),

    // HITS hub/authority (NEW r10): the DIRECTED customer→supplier
    // bipartite graph — suppliers accrue authority (endorsed by many
    // strong hubs), customers hub mass. Unnormalized integer path
    // counts after 2 rounds, so the oracle unrolls a=Aᵀh / h=Aa
    // bit-for-bit; ranking identical to normalized HITS
    "q171e_hits" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val de = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      Graph.hitsCounts(de, "src", "dst", iterations = 2)
        .orderBy(col("auth").desc, col("node"))
        .limit(100)
    }),

    // HITS at convergence depth (NEW r11): 6 rounds with truncating
    // milli-rescale after each half-step — the unscaled-counts cap of
    // 4 rounds is gone (post-rescale values ≤ 1000; overflow would
    // need a single ~9.2e12-degree node). Every step is exact integer
    // arithmetic, so the oracle unrolls all 12 half-steps + rescales
    // bit-for-bit
    "q171f_hits_milli" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val de = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      Graph.hitsMilli(de, "src", "dst", iterations = 6)
        .orderBy(col("auth_milli").desc, col("node"))
        .limit(100)
    }),

    // edge-WEIGHTED convergence-depth HITS (NEW r11): endorsement mass
    // scales with the lineitem count per (customer, supplier) pair —
    // q171d's weighting on q171f's rescaled loop; w ≡ 1 degenerates to
    // q171f exactly
    // GNN neighbor feature aggregation (NEW r12): GraphSAGE-style
    // two-layer prep over the customer↔supplier graph — hop 1
    // aggregates in-neighbors' account-balance cents (deg/sum/min/
    // max), hop 2 re-aggregates the hop-1 sums/degrees; NO division
    // anywhere, so every column is an exact integer fold
    "q247_neighbor_agg" -> ((s, d) => {
      val cust = Tables.customer(s, d).select(
        col("c_custkey").as("node"),
        round(col("c_acctbal") * 100).cast("long").as("feat"))
      val supp = Tables.supplier(s, d).select(
        (col("s_suppkey") + 1000000L).as("node"),
        round(col("s_acctbal") * 100).cast("long").as("feat"))
      Graph.neighborAgg(edges(s, d), "src", "dst",
          cust.union(supp), "node", "feat")
        .orderBy(col("node"))
    }),

    "q171g_hits_milli_weighted" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val we = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .agg(count(lit(1)).as("w"))
      Graph.hitsMilliWeighted(we, "src", "dst", "w", iterations = 6)
        .orderBy(col("auth_milli").desc, col("node"))
        .limit(100)
    }),

    // degree profile of the same graph (symmetric, so out = in; the
    // gate checks both legs anyway)
    "q171b_degree_stats" -> ((s, d) => {
      Graph.degreeStats(edges(s, d), "src", "dst")
        .orderBy(col("total_deg").desc, col("node"))
        .limit(100)
    }),

    // degree assortativity of the trade graph (NEW r11): Newman's
    // degree-degree correlation in exact floor-micro — bipartite
    // interaction graphs run disassortative (hubs link to leaves);
    // the moment sums are exact integers, one shared IEEE division
    "q232_assortativity" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val de = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      Graph.assortativityMicro(de, "src", "dst")
    }),

    // modularity of the nation partition over the trade graph (NEW
    // r11): score how nationally assortative customer↔supplier trade
    // is — per-nation (n_nodes, e_within, d_sum, term_micro); the
    // community-quality gate for whatever labelPropagate/CC produced,
    // here against ground-truth labels so the oracle is closed-form
    "q231_modularity" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val de = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      val labels = Tables.customer(s, d)
        .select(col("c_custkey").as("node"), col("c_nationkey").as("lbl"))
        .union(Tables.supplier(s, d)
          .select((col("s_suppkey") + 1000000L).as("node"),
            col("s_nationkey").as("lbl")))
      Graph.modularityMicro(de, "src", "dst", labels, "node", "lbl")
        .orderBy(col("label").cast("long"))
    }),

    // weighted modularity (NEW r11): the same nation partition scored
    // over interaction COUNTS per pair — e_c/d_c/m become weight sums
    "q231b_modularity_weighted" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val de = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .agg(count(lit(1)).as("w"))
      val labels = Tables.customer(s, d)
        .select(col("c_custkey").as("node"), col("c_nationkey").as("lbl"))
        .union(Tables.supplier(s, d)
          .select((col("s_suppkey") + 1000000L).as("node"),
            col("s_nationkey").as("lbl")))
      Graph.modularityWeightedMicro(de, "src", "dst", "w", labels,
          "node", "lbl")
        .orderBy(col("label").cast("long"))
    }),

    // label propagation: region labels seeded on HALF the customers
    // (even keys) spread to suppliers in round 1 and back to the
    // unseeded customers in round 2 — true two-hop spreading with
    // clamped seeds, integer votes, lexicographic tie-break
    "q175_label_prop" -> ((s, d) => {
      val seeds = Tables.customer(s, d)
        .filter(col("c_custkey") % 2 === 0)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey").as("node"), col("r_name").as("label"))
      Graph.labelPropagate(edges(s, d), "src", "dst", seeds,
          "node", "label", iterations = 2)
        .orderBy(col("node"))
    }),

    // 3-round k-core peel (k = 10): low-degree customers fall out
    // first, cascading supplier degrees down — the dense-core spam
    // screen, fixed-depth so the oracle unrolls exactly. k = 10 is the
    // largest k whose core is non-empty at EVERY fixture scale (the
    // sf0.001 customer-degree ceiling is 10); the smoke suite runs all
    // queries at sf0.001.
    "q180_kcore" -> ((s, d) => {
      Graph.kCorePeel(edges(s, d), "src", "dst", k = 10, rounds = 3)
        .orderBy(col("node"))
    }),

    // k-core peel to FIXPOINT (rounds = -1, NEW r9): the TPC-H graph
    // converges after ONE effective peel at every fixture scale
    // (measured), which would gate nothing — so the fixpoint path runs
    // on a designed cascade fixture (q195's VALUES convention): a
    // 10-node chain welded to a triangle plus a star. Peeling at k = 2
    // strips one chain node per round (~10 cascading rounds) before
    // the triangle stabilizes as the exact 2-core — a depth at which
    // fixed-3-round peeling and the true fixpoint give DIFFERENT
    // answers, so the gate actually discriminates. Oracle unrolls 14
    // peels (> measured depth; converged peels are no-ops).
    "q180b_kcore_fixpoint" -> ((s, d) => {
      import s.implicits._
      Graph.kCorePeel(kcoreFixture.toDF("src", "dst"), "src", "dst",
          k = 2, rounds = -1)
        .orderBy(col("node"))
    }),

    // triangle census + clustering coefficient over the supplier
    // co-occurrence graph (suppliers sharing an order among high-
    // quantity lineitems — the bipartite q171 graph is triangle-free
    // by construction, so the density signal needs a unipartite
    // projection; the quantity filter keeps it sparse, the same way a
    // host graph is thresholded before density screening)
    "q181_triangles" -> ((s, d) => {
      Graph.triangleCount(coEdges(s, d), "src", "dst")
        .orderBy(col("triangles").desc, col("node"))
        .limit(100)
    }),

    // capped weighted bipartite projection (NEW r11): order→part
    // incidence collapsed to a part–part co-occurrence graph, each
    // order capped to its 8 smallest parts BEFORE pairing — the
    // quadratic-blowup control a viral basket needs (one crawler-trap
    // page otherwise emits C(1e6, 2) pairs); weights = shared-order
    // counts, top edges by weight
    "q238_bipartite_project" -> ((s, d) => {
      val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      Graph.bipartiteProject(hi, "ok", "pk", maxPerBasket = 8)
        .orderBy(col("w").desc, col("item_a"), col("item_b"))
        .limit(100)
    }),

    // association rules (NEW r12): market-basket mining over the q238
    // substrate — both directed rules per surviving pair, confidence /
    // lift in floor ppm (capped pair counts over TRUE item counts, so
    // the scores are conservative when the viral-basket cap bites)
    "q261_association_rules" -> ((s, d) => {
      val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      Graph.associationRules(hi, "ok", "pk", maxPerBasket = 8,
          minSupport = 2L)
        .orderBy(col("lift_ppm").desc, col("antecedent"),
          col("consequent"))
        .limit(100)
    }),

    // bounded-round k-truss (NEW r12): edge-grade density screen over
    // the supplier co-occurrence graph — every surviving edge sits in
    // >= k-2 triangles within the surviving subgraph (a link farm can
    // fake degree, not triangle support); round-synchronous peel, the
    // q180 fixed-depth contract, final support as the witness
    "q251_ktruss" -> ((s, d) => {
      Graph.kTruss(coEdges(s, d), "src", "dst", k = 4, rounds = 2)
        .orderBy(col("src"), col("dst"))
    }),

    // k-truss to FIXPOINT (NEW r13): rounds = -1 peels until the edge
    // count is stable — on a designed cascade fixture (ktrussFixture)
    // where bounded-round-2 and the fixpoint DIFFER: apex edges die
    // round 1, the chords they reinforced round 2, the bare cycle
    // round 3 (bounded-2 would still carry it at support 0); only the
    // welded K5 anchor (support 3 per edge) survives. Oracle unrolls 6
    // peels > the measured depth-4 convergence (the q180b discipline)
    "q251b_ktruss_fixpoint" -> ((s, d) => {
      import s.implicits._
      Graph.kTruss(ktrussFixture.toDF("src", "dst"), "src", "dst",
          k = 4, rounds = -1)
        .orderBy(col("src"), col("dst"))
    }),

    // link prediction over the PART co-occurrence graph (q181's
    // supplier graph saturates to a complete graph at small scale —
    // a complete graph has no non-edges to predict; the part graph at
    // quantity >= 40 stays sparse at every fixture scale): top
    // candidate non-edges by common-neighbor support, Adamic–Adar in
    // floor-nano integer units as the tie-sensitive score
    "q185_link_predict" -> ((s, d) => {
      val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = hi.as("x").join(hi.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      Graph.linkPredict(edges, "src", "dst",
          maxPivotDeg = 1000, minCommon = 2)
        .orderBy(col("cn").desc, col("aa_nano").desc, col("x"), col("y"))
        .limit(100)
    }),

    // harmonic centrality (NEW r9): the Common Crawl host-ranking
    // metric, truncated at 3 hops, exact integer micro-units — over
    // the q185-style sparse part co-occurrence graph at quantity >= 45
    // (threshold raised from q185's 40: depth-3 exact balls on the
    // >= 40 graph are ~4 M pairs at sf0.1 — 45 keeps the same shape
    // at ~1/10 the pair volume; the supplier graph saturates complete
    // at small SF: every ball would be everything)
    "q209_harmonic_centrality" -> ((s, d) => {
      val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = hi.as("x").join(hi.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      Graph.harmonicCentralityMicro(edges, "src", "dst", maxDepth = 3)
        .orderBy(col("harmonic_micro").desc, col("node"))
        .limit(100)
    }),

    // sampled Brandes betweenness (NEW r15): the BROKERAGE centrality
    // — which parts sit on the shortest paths BETWEEN co-occurrence
    // communities (a bridge host a crawler must not drop scores high
    // here while degree/PageRank miss it). 16 hash-picked pivots
    // (Brandes–Pich sampling), depth-3 truncation (the q209 cut),
    // integer micro-unit dependency accumulation with per-term floors
    // — bit-exact vs the oracle's unrolled forward/backward replay
    "q291_betweenness" -> ((s, d) => {
      val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = hi.as("x").join(hi.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      Graph.betweennessSampled(edges, "src", "dst", k = 16, maxDepth = 3)
        .orderBy(col("bc_micro").desc, col("node"))
        .limit(100)
    }),

    // HyperBall harmonic centrality (NEW r10): the WEB-SCALE tier of
    // q209 — fixed-size HLL register arrays per node instead of the
    // exact (v, u) pair set (the Boldi–Vigna algorithm Common Crawl
    // runs on its host graph). The sketch estimate is deterministic
    // (fixed splitmix64 hash, integer registers, StrictMath) but not
    // SQL-replayable, so the gate HASHES the exact values + per-node
    // WITHIN-BOUND flags: every node's estimated ball size and
    // harmonic sum must sit within 10% + small additive slack of the
    // exact op (p = 12 → 4096 registers, HLL std err ≈ 1.6%; fixture
    // balls sit deep in the linear-counting range where it is far
    // tighter — the bound only trips if the sketch genuinely breaks).
    // The oracle restates the bound as literal 1-flags over the exact
    // BFS, so a single out-of-bound node reddens the gate.
    "q209b_harmonic_hyperball" -> ((s, d) => {
      val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      // checkpoint once: both legs (exact BFS + sketch) consume the
      // same materialized edge frame instead of re-deriving the
      // lineitem self-join twice
      val edges = hi.as("x").join(hi.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        .localCheckpoint(true)
      val exact = Graph.harmonicCentralityMicro(edges, "src", "dst",
        maxDepth = 3)
      val est = Graph.harmonicCentralityHyperBall(edges, "src", "dst",
        maxDepth = 3, p = 12)
      exact.join(est, Seq("node"))
        .select(col("node"), col("harmonic_micro"), col("n_reached"),
          (abs(col("n_reached_est") - col("n_reached")) <=
            col("n_reached") / 10L + lit(3L)).cast("int").as("ball_ok"),
          (abs(col("harmonic_est_micro") - col("harmonic_micro")) <=
            (col("n_reached") / 10L + lit(3L)) * 1000000L)
            .cast("int").as("harm_ok"))
        .orderBy(col("node"))
    }),

    // neighborhood function + effective diameter (NEW r10): N(d) =
    // pairs within d hops, and the 90% effective diameter — the
    // Boldi–Vigna "degrees of separation" statistic. Exact N(d) and
    // the floor-micro interpolated diameter hash-gate outright (all
    // integer); the HyperBall sketch's per-depth totals gate as
    // within-bound flags (5% + 3; p = 10 suffices here — GLOBAL sums
    // concentrate far below the per-node HLL error, measured 0.15%
    // at the stress tier). Sparser qty >= 48 slice: the op is
    // scale-free and the HB stress ladder carries the scale receipts
    "q209c_effective_diameter" -> ((s, d) => {
      val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 48)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = hi.as("x").join(hi.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        .localCheckpoint(true)
      val exact = Graph.neighborhoodFunctionExact(edges, "src", "dst",
        maxDepth = 3)
      val est = Graph.neighborhoodFunctionHyperBall(edges, "src", "dst",
        maxDepth = 3, p = 10)
      val eff = Graph.effectiveDiameterMicro(exact, "n_pairs", qBp = 9000)
      exact.join(est, Seq("d"))
        .select(col("d"), col("n_pairs"),
          (abs(col("n_pairs_est") - col("n_pairs")) <=
            col("n_pairs") / 20L + lit(3L)).cast("int").as("nf_ok"))
        .crossJoin(broadcast(eff))
        .orderBy(col("d"))
    })
  )

  /** Cascade fixture for q180b (VALUES both sides): chain 1–…–10
    * welded at node 10 to triangle 100-101-102, plus a star
    * 200→(201…205). A k = 2 peel strips one chain end per round and
    * dissolves the star in two; the fixpoint is exactly the triangle,
    * reached after ~10 cascading rounds.
    */
  private val kcoreFixture: Seq[(Long, Long)] = Seq(
    1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 7L,
    7L -> 8L, 8L -> 9L, 9L -> 10L, 10L -> 100L,
    100L -> 101L, 101L -> 102L, 102L -> 100L,
    200L -> 201L, 200L -> 202L, 200L -> 203L, 200L -> 204L, 200L -> 205L)

  /** Cascade fixture for q251b: an 8-cycle (0..7) with distance-2
    * chords, each chord reinforced by one apex triangle (apex 20+i on
    * chord (i, i+2)), plus a disjoint K5 anchor (100..104). At k = 4
    * (support >= 2) the peel cascades one layer per round: apex edges
    * (support 1) die in round 1, the chords (2 → 1 once their apex
    * triangle breaks) in round 2, the bare cycle (2 → 0 once the
    * chords vanish) in round 3 — so bounded-round-2 still carries the
    * cycle at support 0 while the fixpoint is exactly the K5 (every
    * K5 edge sits in 3 surviving triangles forever).
    */
  private val ktrussFixture: Seq[(Long, Long)] = {
    val cycle = (0 until 8).map(i => (i.toLong, ((i + 1) % 8).toLong))
    val chords = (0 until 8).map(i => (i.toLong, ((i + 2) % 8).toLong))
    val apexes = (0 until 8).flatMap(i => Seq(
      (i.toLong, (20 + i).toLong),
      ((20 + i).toLong, ((i + 2) % 8).toLong)))
    val k5 = for {
      x <- 100 to 104
      y <- (x + 1) to 104
    } yield (x.toLong, y.toLong)
    cycle ++ chords ++ apexes ++ k5
  }

  /** Unipartite supplier co-occurrence graph: s1 — s2 iff both supplied
    * high-quantity (>= 45) lineitems of the same order. Per-order
    * fan-out is bounded by order size, so edge generation is linear.
    */
  private def coEdges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    hi.as("x").join(hi.as("y"),
        col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("src"), col("y.sk").as("dst"))
  }

  /** Modularity replay over the nation-labeled trade graph — the
    * unweighted tier dedups pairs (w ≡ 1), the weighted tier carries
    * the per-pair lineitem count; everything else (canonical
    * undirected form, label joins, the term spelling) is shared.
    */
  private def modularityOracleSql(weighted: Boolean): String = {
    val term = graft.ops.Graph.modularityTermExpr("e_within", "d_sum", "m")
    val cond = graft.ops.Graph.conductanceTermExpr("e_within", "d_sum", "m")
    val e0 =
      if (weighted)
        """e0 AS MATERIALIZED (SELECT
          |    LEAST(o_custkey, l_suppkey + 1000000) AS a,
          |    GREATEST(o_custkey, l_suppkey + 1000000) AS b,
          |    CAST(COUNT(*) AS BIGINT) AS w
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE o_custkey != l_suppkey + 1000000 GROUP BY 1, 2)""".stripMargin
      else
        """e0 AS MATERIALIZED (SELECT a, b, CAST(1 AS BIGINT) AS w FROM
          |  (SELECT DISTINCT
          |    LEAST(o_custkey, l_suppkey + 1000000) AS a,
          |    GREATEST(o_custkey, l_suppkey + 1000000) AS b
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE o_custkey != l_suppkey + 1000000))""".stripMargin
    s"""WITH $e0,
       |lab AS (SELECT c_custkey AS n, CAST(c_nationkey AS VARCHAR)
       |    AS lbl FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000,
       |    CAST(s_nationkey AS VARCHAR) FROM supplier),
       |nodes AS (SELECT a AS n FROM e0 UNION SELECT b FROM e0),
       |labeled AS MATERIALIZED (SELECT nodes.n,
       |    COALESCE(lab.lbl, CAST(nodes.n AS VARCHAR)) AS lbl
       |  FROM nodes LEFT JOIN lab USING (n)),
       |mm AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM e0),
       |deg AS (SELECT n, CAST(SUM(w) AS BIGINT) AS deg FROM
       |  (SELECT a AS n, w FROM e0 UNION ALL SELECT b, w FROM e0)
       |  GROUP BY n),
       |ds AS (SELECT l.lbl, CAST(SUM(deg) AS BIGINT) AS d_sum,
       |    CAST(COUNT(*) AS BIGINT) AS n_nodes
       |  FROM deg d JOIN labeled l USING (n) GROUP BY l.lbl),
       |ew AS (SELECT la.lbl, CAST(SUM(e0.w) AS BIGINT) AS e_within
       |  FROM e0 JOIN labeled la ON e0.a = la.n
       |  JOIN labeled lb ON e0.b = lb.n
       |  WHERE la.lbl = lb.lbl GROUP BY la.lbl),
       |f AS (SELECT ds.lbl AS label, ds.n_nodes,
       |    COALESCE(ew.e_within, 0) AS e_within, ds.d_sum
       |  FROM ds LEFT JOIN ew ON ds.lbl = ew.lbl)
       |SELECT label, n_nodes, e_within, d_sum, $term AS term_micro,
       |  $cond AS conductance_micro
       |FROM f CROSS JOIN mm
       |ORDER BY CAST(label AS BIGINT)""".stripMargin
  }

  /** Full 6-round unroll of hitsMilli / hitsMilliWeighted: each
    * half-step is a (weighted) summed join + a (v*1000) // max(v)
    * rescale — non-negative values, so DuckDB's flooring // matches
    * Spark's div exactly. Every frame MATERIALIZED: the f frame is
    * referenced twice (max + rescale) and each round references the
    * previous — inlined CTEs would re-expand the chain exponentially.
    */
  private def hitsMilliOracleSql(weighted: Boolean): String = {
    val wFactor = if (weighted) " * de.w" else ""
    def half(v: Int, out: String, in: String, eK: String,
        nK: String): String = {
      val inCol = if (out == "a") "h" else "a"
      s"""${out}${v}r AS MATERIALIZED (SELECT de.$eK AS node,
         |    CAST(SUM($in.$inCol$wFactor) AS BIGINT) AS $out
         |  FROM de JOIN $in ON de.$nK = $in.node GROUP BY 1),
         |${out}${v}f AS MATERIALIZED (SELECT n.node,
         |    COALESCE(${out}${v}r.$out, 0)
         |    AS $out FROM nodes n LEFT JOIN ${out}${v}r USING (node)),
         |${out}${v}m AS MATERIALIZED (
         |  SELECT MAX($out) AS m FROM ${out}${v}f),
         |$out$v AS MATERIALIZED (SELECT node, CASE WHEN m = 0 THEN 0
         |    ELSE ($out * 1000) // m END AS $out
         |  FROM ${out}${v}f CROSS JOIN ${out}${v}m)""".stripMargin
    }
    val rounds = (1 to 6).map { r =>
      half(r, "a", s"h${r - 1}", "dst", "src") + ",\n" +
        half(r, "h", s"a$r", "src", "dst")
    }.mkString(",\n")
    val de =
      if (weighted)
        """de AS MATERIALIZED (SELECT o_custkey AS src,
          |    l_suppkey + 1000000 AS dst, CAST(COUNT(*) AS BIGINT) AS w
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  GROUP BY 1, 2)""".stripMargin
      else
        """de AS MATERIALIZED (SELECT DISTINCT o_custkey AS src,
          |    l_suppkey + 1000000 AS dst
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin
    s"""WITH $de,
       |nodes AS MATERIALIZED (
       |  SELECT src AS node FROM de UNION SELECT dst FROM de),
       |h0 AS (SELECT node, CAST(1000 AS BIGINT) AS h FROM nodes),
       |$rounds
       |SELECT a6.node, a6.a AS auth_milli, h6.h AS hub_milli
       |FROM a6 JOIN h6 USING (node)
       |ORDER BY auth_milli DESC, node LIMIT 100""".stripMargin
  }

  override def oracle: Map[String, String] = Map(
    "q171_pagerank" -> {
      // unrolled 3-round replay: r_{i+1} = 0.15e9 + 85 * Σ floor-div
      // contributions div 100, all BIGINT floor division
      def round(i: Int): String =
        s"""c$i AS (SELECT e.dst AS node, CAST(SUM(r.r // d.odeg) AS BIGINT) AS s
           |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
           |  JOIN deg d ON e.src = d.src GROUP BY e.dst),
           |r$i AS (SELECT n.node,
           |    CAST(150000000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN c$i c ON n.node = c.node)""".stripMargin
      s"""WITH $sqlEdges,
         |deg AS (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
         |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, r AS rank_ppb FROM r3
         |ORDER BY rank_ppb DESC, node LIMIT 100""".stripMargin
    },

    // unrolled a=Aᵀh / h=Aa path counts on the DIRECTED bipartite
    // graph — no normalization, so every value is exact BIGINT
    "q171e_hits" ->
      s"""WITH de AS (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |nodes AS (SELECT src AS node FROM de UNION SELECT dst FROM de),
         |a1r AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS a FROM de GROUP BY 1),
         |a1 AS (SELECT n.node, COALESCE(a1r.a, 0) AS a
         |  FROM nodes n LEFT JOIN a1r USING (node)),
         |h1r AS (SELECT de.src AS node, CAST(SUM(a1.a) AS BIGINT) AS h
         |  FROM de JOIN a1 ON de.dst = a1.node GROUP BY 1),
         |h1 AS (SELECT n.node, COALESCE(h1r.h, 0) AS h
         |  FROM nodes n LEFT JOIN h1r USING (node)),
         |a2r AS (SELECT de.dst AS node, CAST(SUM(h1.h) AS BIGINT) AS a
         |  FROM de JOIN h1 ON de.src = h1.node GROUP BY 1),
         |a2 AS (SELECT n.node, COALESCE(a2r.a, 0) AS a
         |  FROM nodes n LEFT JOIN a2r USING (node)),
         |h2r AS (SELECT de.src AS node, CAST(SUM(a2.a) AS BIGINT) AS h
         |  FROM de JOIN a2 ON de.dst = a2.node GROUP BY 1),
         |h2 AS (SELECT n.node, COALESCE(h2r.h, 0) AS h
         |  FROM nodes n LEFT JOIN h2r USING (node))
         |SELECT a2.node, a2.a AS auth, h2.h AS hub
         |FROM a2 JOIN h2 USING (node)
         |ORDER BY auth DESC, node LIMIT 100""".stripMargin,

    // full 6-round unroll of hitsMilli: each half-step is a summed
    // join + a (v*1000) // max(v) rescale — non-negative values, so
    // DuckDB's flooring // matches Spark's div exactly
    "q171f_hits_milli" -> hitsMilliOracleSql(weighted = false),

    "q171g_hits_milli_weighted" -> hitsMilliOracleSql(weighted = true),

    "q247_neighbor_agg" ->
      s"""WITH $sqlEdges,
         |feats AS (SELECT c_custkey AS node,
         |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS feat FROM customer
         |  UNION ALL SELECT s_suppkey + 1000000,
         |    CAST(ROUND(s_acctbal * 100) AS BIGINT) FROM supplier),
         |h1 AS (SELECT e.dst AS node, CAST(COUNT(*) AS BIGINT) AS deg1,
         |    CAST(SUM(f.feat) AS BIGINT) AS sum1, MIN(f.feat) AS min1,
         |    MAX(f.feat) AS max1
         |  FROM edges e JOIN feats f ON e.src = f.node GROUP BY e.dst),
         |h2 AS (SELECT e.dst AS node,
         |    CAST(SUM(h.deg1) AS BIGINT) AS deg2_sum,
         |    CAST(SUM(h.sum1) AS BIGINT) AS sum2
         |  FROM edges e JOIN h1 h ON e.src = h.node GROUP BY e.dst)
         |SELECT f.node, f.feat, h1.deg1, h1.sum1, h1.min1, h1.max1,
         |  h2.deg2_sum, h2.sum2
         |FROM feats f LEFT JOIN h1 USING (node) LEFT JOIN h2 USING (node)
         |ORDER BY f.node""".stripMargin,

    "q171c_personalized_pagerank" -> {
      def round(i: Int): String =
        s"""c$i AS (SELECT e.dst AS node, CAST(SUM(r.r // d.odeg) AS BIGINT) AS s
           |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
           |  JOIN deg d ON e.src = d.src GROUP BY e.dst),
           |r$i AS (SELECT bn.node,
           |    CAST(bn.b + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
           |  FROM bn LEFT JOIN c$i c ON bn.node = c.node)""".stripMargin
      s"""WITH $sqlEdges,
         |deg AS (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
         |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |seeds AS (SELECT DISTINCT c_custkey AS node
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'),
         |sn AS (SELECT n.node FROM nodes n JOIN seeds s ON n.node = s.node),
         |k AS (SELECT (SELECT COUNT(*) FROM nodes) AS nv,
         |    (SELECT COUNT(*) FROM sn) AS ns),
         |basec AS (SELECT CAST((15 * CAST(1000000000 AS BIGINT) * nv)
         |    // (100 * ns) AS BIGINT) AS b FROM k),
         |bn AS (SELECT n.node,
         |    CAST(CASE WHEN s.node IS NOT NULL THEN (SELECT b FROM basec)
         |      ELSE 0 END AS BIGINT) AS b
         |  FROM nodes n LEFT JOIN sn s ON n.node = s.node),
         |r0 AS (SELECT node, b AS r FROM bn),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, r AS rank_ppb FROM r3
         |ORDER BY rank_ppb DESC, node LIMIT 100""".stripMargin
    },

    "q171d_weighted_pagerank" -> {
      def round(i: Int): String =
        s"""c$i AS (SELECT e.dst AS node,
           |    CAST(SUM((r.r * e.w) // s.wsum) AS BIGINT) AS s
           |  FROM wedges e JOIN r${i - 1} r ON e.src = r.node
           |  JOIN ws s ON e.src = s.src GROUP BY e.dst),
           |r$i AS (SELECT n.node,
           |    CAST(150000000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN c$i c ON n.node = c.node)""".stripMargin
      s"""WITH pairs AS (SELECT o_custkey AS c, l_suppkey + 1000000 AS sn,
         |    CAST(COUNT(*) AS BIGINT) AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |wedges AS (SELECT c AS src, sn AS dst, w FROM pairs
         |  UNION ALL SELECT sn AS src, c AS dst, w FROM pairs),
         |ws AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wsum
         |  FROM wedges GROUP BY src),
         |nodes AS (SELECT src AS node FROM wedges
         |  UNION SELECT dst FROM wedges),
         |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, r AS rank_ppb FROM r3
         |ORDER BY rank_ppb DESC, node LIMIT 100""".stripMargin
    },

    "q171b_degree_stats" ->
      s"""WITH $sqlEdges,
         |o AS (SELECT src AS node, COUNT(*) AS out_deg FROM edges GROUP BY src),
         |i AS (SELECT dst AS node, COUNT(*) AS in_deg FROM edges GROUP BY dst),
         |d AS (SELECT COALESCE(o.node, i.node) AS node,
         |    COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg
         |  FROM o FULL JOIN i ON o.node = i.node)
         |SELECT node, out_deg, in_deg, out_deg + in_deg AS total_deg
         |FROM d ORDER BY total_deg DESC, node LIMIT 100""".stripMargin,

    // the same canonical undirected dedup and the SAME
    // assortativityExpr spelling
    "q232_assortativity" -> {
      val r = graft.ops.Graph.assortativityExpr("s1", "s2", "s3", "se")
      s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT
         |    LEAST(o_custkey, l_suppkey + 1000000) AS a,
         |    GREATEST(o_custkey, l_suppkey + 1000000) AS b
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE o_custkey != l_suppkey + 1000000),
         |deg AS MATERIALIZED (SELECT n, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
         |  GROUP BY n),
         |mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |    CAST(SUM(d) AS BIGINT) AS s1,
         |    CAST(SUM(d * d) AS BIGINT) AS s2,
         |    CAST(SUM(d * d * d) AS BIGINT) AS s3 FROM deg),
         |ee AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         |    CAST(2 * SUM(da.d * db.d) AS BIGINT) AS se
         |  FROM e0 JOIN deg da ON e0.a = da.n JOIN deg db ON e0.b = db.n)
         |SELECT n_nodes, n_edges, s1, s2, s3, se, $r
         |    AS assortativity_micro
         |FROM mo CROSS JOIN ee""".stripMargin
    },

    // the same canonical undirected dedup, label joins, and the SAME
    // modularityTermExpr spelling (one generator, both tiers)
    "q231_modularity" -> modularityOracleSql(weighted = false),

    "q231b_modularity_weighted" -> modularityOracleSql(weighted = true),

    "q175_label_prop" -> {
      // two unrolled LPA rounds: votes from the current assignment,
      // ROW_NUMBER argmax (count desc, label asc), seeds clamped
      def round(i: Int): String =
        s"""v$i AS (SELECT e.dst AS node, a.label, COUNT(*) AS n
           |  FROM edges e JOIN a${i - 1} a ON e.src = a.node GROUP BY 1, 2),
           |w$i AS (SELECT node, label FROM (SELECT node, label,
           |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY n DESC, label) AS rk
           |  FROM v$i) WHERE rk = 1),
           |a$i AS (SELECT node, label, TRUE AS seeded FROM seeds
           |  UNION ALL SELECT w.node, w.label, FALSE AS seeded FROM w$i w
           |  WHERE w.node NOT IN (SELECT node FROM seeds))""".stripMargin
      s"""WITH $sqlEdges,
         |seeds AS (SELECT DISTINCT c_custkey AS node, r_name AS label
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE c_custkey % 2 = 0),
         |a0 AS (SELECT node, label, TRUE AS seeded FROM seeds),
         |${round(1)},
         |${round(2)}
         |SELECT node, label, seeded FROM a2 ORDER BY node""".stripMargin
    },

    "q180_kcore" -> {
      def peel(i: Int): String =
        s"""k$i AS (SELECT src FROM (SELECT src, COUNT(*) AS c FROM e${i - 1}
           |  GROUP BY src) WHERE c >= 10),
           |e$i AS (SELECT e.src, e.dst FROM e${i - 1} e
           |  JOIN k$i a ON e.src = a.src JOIN k$i b ON e.dst = b.src)""".stripMargin
      s"""WITH $sqlEdges,
         |e0 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
         |  WHERE src != dst),
         |${peel(1)},
         |${peel(2)},
         |${peel(3)}
         |SELECT src AS node, COUNT(*) AS degree FROM e3
         |GROUP BY src ORDER BY node""".stripMargin
    },

    "q180b_kcore_fixpoint" -> {
      // 14 unrolled peels > the fixture's measured ~11-round cascade;
      // once converged each further peel is a no-op, so e14 IS the
      // fixpoint the Spark side iterates to. Every peel CTE is
      // MATERIALIZED: DuckDB 1.0 inlines plain CTEs, and each round
      // references the previous one 3× — un-materialized, the planner
      // explodes 3^14 (hangs), the exact analysis-time blowup the
      // Spark side dodges with per-round localCheckpoint
      val vals = kcoreFixture.map { case (a, b) => s"($a, $b)" }.mkString(", ")
      def peel(i: Int): String =
        s"""k$i AS MATERIALIZED (SELECT src FROM
           |  (SELECT src, COUNT(*) AS c FROM e${i - 1}
           |  GROUP BY src) WHERE c >= 2),
           |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
           |  JOIN k$i a ON e.src = a.src JOIN k$i b ON e.dst = b.src)""".stripMargin
      s"""WITH raw AS (SELECT * FROM (VALUES $vals) AS v(src, dst)),
         |e0 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)
         |  WHERE src != dst),
         |${(1 to 14).map(peel).mkString(",\n")}
         |SELECT src AS node, COUNT(*) AS degree FROM e14
         |GROUP BY src ORDER BY node""".stripMargin
    },

    "q238_bipartite_project" ->
      // replay: distinct incidence, per-basket cap by item id, pair
      // self-join, shared-basket counts
      """WITH hi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem WHERE l_quantity >= 40),
        |c AS (SELECT b, i FROM (SELECT b, i,
        |    ROW_NUMBER() OVER (PARTITION BY b ORDER BY i) AS rn FROM hi)
        |  WHERE rn <= 8)
        |SELECT x.i AS item_a, y.i AS item_b, COUNT(*) AS w
        |FROM c x JOIN c y ON x.b = y.b AND x.i < y.i
        |GROUP BY 1, 2 ORDER BY w DESC, item_a, item_b LIMIT 100""".stripMargin,

    "q261_association_rules" ->
      // capped pair counts (q238 replay) + TRUE uncapped item/basket
      // counts; both directed rules, integer ppm scores
      """WITH hi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem WHERE l_quantity >= 40),
        |c AS (SELECT b, i FROM (SELECT b, i,
        |    ROW_NUMBER() OVER (PARTITION BY b ORDER BY i) AS rn FROM hi)
        |  WHERE rn <= 8),
        |p AS (SELECT x.i AS ia, y.i AS ib, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM c x JOIN c y ON x.b = y.b AND x.i < y.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |itemn AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS nb
        |  FROM hi GROUP BY i),
        |tot AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_baskets
        |  FROM hi),
        |dr AS (SELECT ia AS antecedent, ib AS consequent, w FROM p
        |  UNION ALL SELECT ib, ia, w FROM p)
        |SELECT dr.antecedent, dr.consequent, dr.w AS support,
        |  na.nb AS n_ante, nc.nb AS n_cons,
        |  (dr.w * 1000000) // na.nb AS conf_ppm,
        |  (dr.w * tot.n_baskets * 1000000) // (na.nb * nc.nb) AS lift_ppm
        |FROM dr JOIN itemn na ON na.i = dr.antecedent
        |JOIN itemn nc ON nc.i = dr.consequent CROSS JOIN tot
        |ORDER BY lift_ppm DESC, antecedent, consequent
        |LIMIT 100""".stripMargin,

    "q251_ktruss" -> {
      // canonical-form triangle enumeration (x<y<z, each once) is
      // orientation-free, so the support counts equal the Spark op's
      // oriented enumeration; two peel rounds unrolled + final recount
      def tri(e: String, tag: String) =
        s"""t$tag AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
           |  FROM $e e1 JOIN $e e2 ON e2.a = e1.b
           |  JOIN $e e3 ON e3.a = e1.a AND e3.b = e2.b),
           |s$tag AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS sup FROM (
           |  SELECT x AS a, y AS b FROM t$tag
           |  UNION ALL SELECT x, z FROM t$tag
           |  UNION ALL SELECT y, z FROM t$tag) GROUP BY a, b)"""
          .stripMargin
      s"""WITH hi AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_quantity >= 45),
         |e0 AS (SELECT DISTINCT x.sk AS a, y.sk AS b
         |  FROM hi x JOIN hi y ON x.ok = y.ok AND x.sk < y.sk),
         |${tri("e0", "0")},
         |e1 AS (SELECT e0.a, e0.b FROM e0
         |  JOIN s0 ON s0.a = e0.a AND s0.b = e0.b WHERE s0.sup >= 2),
         |${tri("e1", "1")},
         |e2 AS (SELECT e1.a, e1.b FROM e1
         |  JOIN s1 ON s1.a = e1.a AND s1.b = e1.b WHERE s1.sup >= 2),
         |${tri("e2", "2")}
         |SELECT e2.a AS src, e2.b AS dst, COALESCE(s2.sup, 0) AS support
         |FROM e2 LEFT JOIN s2 ON s2.a = e2.a AND s2.b = e2.b
         |ORDER BY src, dst""".stripMargin
    },

    "q251b_ktruss_fixpoint" -> {
      // 6 unrolled truss peels > the fixture's measured depth-4
      // convergence; converged peels are no-ops, so e6 IS the
      // fixpoint. MATERIALIZED per round — each triangle CTE
      // references its edge frame 3x (the q180b planner-blowup lesson)
      val vals = ktrussFixture.map { case (a, b) => s"($a, $b)" }
        .mkString(", ")
      def tri(i: Int): String =
        s"""t$i AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
           |  FROM e$i e1 JOIN e$i e2 ON e2.a = e1.b
           |  JOIN e$i e3 ON e3.a = e1.a AND e3.b = e2.b),
           |s$i AS MATERIALIZED (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS sup FROM (
           |  SELECT x AS a, y AS b FROM t$i
           |  UNION ALL SELECT x, z FROM t$i
           |  UNION ALL SELECT y, z FROM t$i) GROUP BY a, b)""".stripMargin
      def peel(i: Int): String =
        s"""${tri(i - 1)},
           |e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
           |  JOIN s${i - 1} s ON s.a = e.a AND s.b = e.b
           |  WHERE s.sup >= 2)""".stripMargin
      s"""WITH raw AS (SELECT * FROM (VALUES $vals) AS v(src, dst)),
         |e0 AS (SELECT DISTINCT LEAST(src, dst) AS a,
         |    GREATEST(src, dst) AS b
         |  FROM raw WHERE src != dst),
         |${(1 to 6).map(peel).mkString(",\n")},
         |${tri(6)}
         |SELECT e6.a AS src, e6.b AS dst, COALESCE(s6.sup, 0) AS support
         |FROM e6 LEFT JOIN s6 ON s6.a = e6.a AND s6.b = e6.b
         |ORDER BY src, dst""".stripMargin
    },

    "q181_triangles" ->
      // full replay of the degree-ordered orientation: normalize,
      // rank by (deg, node), orient low→high, wedge self-join on the
      // pivot, closing join, per-corner attribution, floor-bp coeff
      s"""WITH hi AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_quantity >= 45),
         |raw AS (SELECT x.sk AS a, y.sk AS b FROM hi x JOIN hi y
         |  ON x.ok = y.ok AND x.sk < y.sk),
         |e0 AS (SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b
         |  FROM raw WHERE a != b),
         |deg AS (SELECT node, COUNT(*) AS deg FROM (
         |  SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
         |  GROUP BY node),
         |o AS (SELECT
         |    CASE WHEN pa.deg < pb.deg OR (pa.deg = pb.deg AND e0.a < e0.b)
         |      THEN e0.a ELSE e0.b END AS u,
         |    CASE WHEN pa.deg < pb.deg OR (pa.deg = pb.deg AND e0.a < e0.b)
         |      THEN e0.b ELSE e0.a END AS v,
         |    CASE WHEN pa.deg < pb.deg OR (pa.deg = pb.deg AND e0.a < e0.b)
         |      THEN pb.deg ELSE pa.deg END AS dv
         |  FROM e0 JOIN deg pa ON e0.a = pa.node JOIN deg pb ON e0.b = pb.node),
         |w AS (SELECT o1.u, o1.v AS x, o2.v AS y FROM o o1 JOIN o o2
         |  ON o1.u = o2.u
         |  WHERE o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v)),
         |t AS (SELECT w.u, w.x, w.y FROM w JOIN o
         |  ON o.u = w.x AND o.v = w.y),
         |per AS (SELECT node, COUNT(*) AS triangles FROM (
         |  SELECT u AS node FROM t UNION ALL SELECT x FROM t
         |  UNION ALL SELECT y FROM t) GROUP BY node)
         |SELECT d.node, d.deg, COALESCE(p.triangles, 0) AS triangles,
         |  CASE WHEN d.deg >= 2
         |    THEN (20000 * COALESCE(p.triangles, 0)) // (d.deg * (d.deg - 1))
         |  END AS cc_bp
         |FROM deg d LEFT JOIN per p ON d.node = p.node
         |ORDER BY triangles DESC, d.node LIMIT 100""".stripMargin,

    "q185_link_predict" ->
      s"""WITH hi AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk
         |  FROM lineitem WHERE l_quantity >= 40),
         |raw AS (SELECT x.sk AS a, y.sk AS b FROM hi x JOIN hi y
         |  ON x.ok = y.ok AND x.sk < y.sk),
         |e0 AS (SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b
         |  FROM raw WHERE a != b),
         |adj AS (SELECT a AS u, b AS v FROM e0
         |  UNION ALL SELECT b AS u, a AS v FROM e0),
         |dg AS (SELECT u, COUNT(*) AS deg FROM adj GROUP BY u),
         |small AS (SELECT adj.u, adj.v, dg.deg FROM adj
         |  JOIN dg ON adj.u = dg.u WHERE dg.deg <= 1000),
         |wedge AS (SELECT s1.v AS x, s2.v AS y, s1.deg AS deg
         |  FROM small s1 JOIN small s2 ON s1.u = s2.u AND s1.v < s2.v),
         |sc AS (SELECT x, y, COUNT(*) AS cn,
         |    CAST(SUM(${graft.ops.Graph.aaGainExpr}) AS BIGINT) AS aa_nano
         |  FROM wedge GROUP BY x, y HAVING COUNT(*) >= 2)
         |SELECT x, y, cn, aa_nano FROM sc
         |WHERE NOT EXISTS (SELECT 1 FROM e0
         |  WHERE e0.a = sc.x AND e0.b = sc.y)
         |ORDER BY cn DESC, aa_nano DESC, x, y LIMIT 100""".stripMargin,

    "q209_harmonic_centrality" ->
      // unrolled 3-round simultaneous BFS; every round CTE is
      // MATERIALIZED (plain CTEs inline and each round references the
      // previous twice — the q180b planner-blowup lesson)
      s"""WITH hi AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk
         |  FROM lineitem WHERE l_quantity >= 45),
         |raw AS (SELECT x.sk AS a, y.sk AS b FROM hi x JOIN hi y
         |  ON x.ok = y.ok AND x.sk < y.sk),
         |e AS MATERIALIZED (SELECT esrc, edst FROM (
         |  SELECT a AS esrc, b AS edst FROM raw WHERE a != b
         |  UNION SELECT b, a FROM raw WHERE a != b)),
         |nodes AS MATERIALIZED (SELECT DISTINCT esrc AS node FROM e),
         |r0 AS MATERIALIZED (SELECT node AS v, node AS u FROM nodes),
         |f1 AS MATERIALIZED (SELECT DISTINCT r.v, e.esrc AS u
         |  FROM r0 r JOIN e ON r.u = e.edst
         |  WHERE NOT EXISTS (SELECT 1 FROM r0 x
         |    WHERE x.v = r.v AND x.u = e.esrc)),
         |r1 AS MATERIALIZED (SELECT v, u FROM r0 UNION SELECT v, u FROM f1),
         |f2 AS MATERIALIZED (SELECT DISTINCT f.v, e.esrc AS u
         |  FROM f1 f JOIN e ON f.u = e.edst
         |  WHERE NOT EXISTS (SELECT 1 FROM r1 x
         |    WHERE x.v = f.v AND x.u = e.esrc)),
         |r2 AS MATERIALIZED (SELECT v, u FROM r1 UNION SELECT v, u FROM f2),
         |f3 AS MATERIALIZED (SELECT DISTINCT f.v, e.esrc AS u
         |  FROM f2 f JOIN e ON f.u = e.edst
         |  WHERE NOT EXISTS (SELECT 1 FROM r2 x
         |    WHERE x.v = f.v AND x.u = e.esrc)),
         |cnt AS (
         |  SELECT v, 1000000 * COUNT(*) AS h, COUNT(*) AS n FROM f1 GROUP BY v
         |  UNION ALL
         |  SELECT v, 500000 * COUNT(*) AS h, COUNT(*) AS n FROM f2 GROUP BY v
         |  UNION ALL
         |  SELECT v, 333333 * COUNT(*) AS h, COUNT(*) AS n FROM f3 GROUP BY v),
         |agg AS (SELECT v, CAST(SUM(h) AS BIGINT) AS harmonic_micro,
         |    CAST(SUM(n) AS BIGINT) AS n_reached
         |  FROM cnt GROUP BY v)
         |SELECT n.node,
         |  COALESCE(a.harmonic_micro, 0) AS harmonic_micro,
         |  COALESCE(a.n_reached, 0) AS n_reached
         |FROM nodes n LEFT JOIN agg a ON n.node = a.v
         |ORDER BY harmonic_micro DESC, n.node LIMIT 100""".stripMargin,

    "q291_betweenness" ->
      // unrolled sampled Brandes: forward 3 rounds of simultaneous
      // BFS from the 16 smallest (knuth-mix, node) pivots with exact
      // path counts, then backward dependency accumulation — each
      // term floor(sigma_v * (1e6 + delta_w) / sigma_w) floors
      // independently (HUGEINT product mirrors Spark's DECIMAL(38,0))
      // and sums as BIGINT. Every round CTE MATERIALIZED (the q180b
      // planner-blowup lesson).
      s"""WITH hi AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk
         |  FROM lineitem WHERE l_quantity >= 45),
         |raw AS (SELECT x.sk AS a, y.sk AS b FROM hi x JOIN hi y
         |  ON x.ok = y.ok AND x.sk < y.sk),
         |e AS MATERIALIZED (SELECT esrc, edst FROM (
         |  SELECT a AS esrc, b AS edst FROM raw WHERE a != b
         |  UNION SELECT b, a FROM raw WHERE a != b)),
         |nodes AS MATERIALIZED (SELECT DISTINCT esrc AS node FROM e),
         |piv AS MATERIALIZED (SELECT node AS p FROM (
         |  SELECT node, ${graft.ops.Graph.knuthMixSql("node")} AS hk
         |  FROM nodes) ORDER BY hk, node LIMIT 16),
         |l0 AS MATERIALIZED (SELECT p, p AS v,
         |  CAST(1 AS BIGINT) AS sigma FROM piv),
         |l1 AS MATERIALIZED (SELECT l.p, e.edst AS v,
         |    CAST(SUM(l.sigma) AS BIGINT) AS sigma
         |  FROM l0 l JOIN e ON l.v = e.esrc
         |  WHERE NOT EXISTS (SELECT 1 FROM l0 x
         |    WHERE x.p = l.p AND x.v = e.edst)
         |  GROUP BY l.p, e.edst),
         |vis1 AS MATERIALIZED (SELECT p, v FROM l0
         |  UNION SELECT p, v FROM l1),
         |l2 AS MATERIALIZED (SELECT l.p, e.edst AS v,
         |    CAST(SUM(l.sigma) AS BIGINT) AS sigma
         |  FROM l1 l JOIN e ON l.v = e.esrc
         |  WHERE NOT EXISTS (SELECT 1 FROM vis1 x
         |    WHERE x.p = l.p AND x.v = e.edst)
         |  GROUP BY l.p, e.edst),
         |vis2 AS MATERIALIZED (SELECT p, v FROM vis1
         |  UNION SELECT p, v FROM l2),
         |l3 AS MATERIALIZED (SELECT l.p, e.edst AS v,
         |    CAST(SUM(l.sigma) AS BIGINT) AS sigma
         |  FROM l2 l JOIN e ON l.v = e.esrc
         |  WHERE NOT EXISTS (SELECT 1 FROM vis2 x
         |    WHERE x.p = l.p AND x.v = e.edst)
         |  GROUP BY l.p, e.edst),
         |d2 AS MATERIALIZED (SELECT l.p, l.v,
         |    CAST(COALESCE(t.s, 0) AS BIGINT) AS delta
         |  FROM l2 l LEFT JOIN (
         |    SELECT i.p, i.v, SUM(CAST((CAST(i.sigma AS HUGEINT)
         |        * 1000000) // w.sigma AS BIGINT)) AS s
         |    FROM l2 i JOIN e ON i.v = e.esrc
         |    JOIN l3 w ON w.p = i.p AND w.v = e.edst
         |    GROUP BY i.p, i.v) t ON t.p = l.p AND t.v = l.v),
         |d1 AS MATERIALIZED (SELECT l.p, l.v,
         |    CAST(COALESCE(t.s, 0) AS BIGINT) AS delta
         |  FROM l1 l LEFT JOIN (
         |    SELECT i.p, i.v, SUM(CAST((CAST(i.sigma AS HUGEINT)
         |        * (1000000 + d.delta)) // w.sigma AS BIGINT)) AS s
         |    FROM l1 i JOIN e ON i.v = e.esrc
         |    JOIN l2 w ON w.p = i.p AND w.v = e.edst
         |    JOIN d2 d ON d.p = i.p AND d.v = e.edst
         |    GROUP BY i.p, i.v) t ON t.p = l.p AND t.v = l.v),
         |allr AS (SELECT p, v, delta FROM d1
         |  UNION ALL SELECT p, v, delta FROM d2
         |  UNION ALL SELECT p, v, CAST(0 AS BIGINT) AS delta FROM l3),
         |agg AS (SELECT v, CAST(SUM(delta) AS BIGINT) AS bc_micro,
         |    COUNT(*) AS n_piv FROM allr GROUP BY v)
         |SELECT n.node, COALESCE(a.bc_micro, 0) AS bc_micro,
         |  COALESCE(a.n_piv, 0) AS n_piv
         |FROM nodes n LEFT JOIN agg a ON n.node = a.v
         |ORDER BY bc_micro DESC, n.node LIMIT 100""".stripMargin,

    "q209b_harmonic_hyperball" ->
      // same unrolled exact BFS as q209 over ALL nodes, plus the
      // within-bound verdict RESTATED as literal 1-flags: the Spark
      // side computes ball_ok/harm_ok by comparing the HyperBall
      // sketch to its own exact op, so any node whose estimate leaves
      // the 10%+3 envelope hashes 0 against the oracle's 1 and the
      // gate goes red. The estimates themselves never cross engines.
      s"""WITH hi AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk
         |  FROM lineitem WHERE l_quantity >= 45),
         |raw AS (SELECT x.sk AS a, y.sk AS b FROM hi x JOIN hi y
         |  ON x.ok = y.ok AND x.sk < y.sk),
         |e AS MATERIALIZED (SELECT esrc, edst FROM (
         |  SELECT a AS esrc, b AS edst FROM raw WHERE a != b
         |  UNION SELECT b, a FROM raw WHERE a != b)),
         |nodes AS MATERIALIZED (SELECT DISTINCT esrc AS node FROM e),
         |r0 AS MATERIALIZED (SELECT node AS v, node AS u FROM nodes),
         |f1 AS MATERIALIZED (SELECT DISTINCT r.v, e.esrc AS u
         |  FROM r0 r JOIN e ON r.u = e.edst
         |  WHERE NOT EXISTS (SELECT 1 FROM r0 x
         |    WHERE x.v = r.v AND x.u = e.esrc)),
         |r1 AS MATERIALIZED (SELECT v, u FROM r0 UNION SELECT v, u FROM f1),
         |f2 AS MATERIALIZED (SELECT DISTINCT f.v, e.esrc AS u
         |  FROM f1 f JOIN e ON f.u = e.edst
         |  WHERE NOT EXISTS (SELECT 1 FROM r1 x
         |    WHERE x.v = f.v AND x.u = e.esrc)),
         |r2 AS MATERIALIZED (SELECT v, u FROM r1 UNION SELECT v, u FROM f2),
         |f3 AS MATERIALIZED (SELECT DISTINCT f.v, e.esrc AS u
         |  FROM f2 f JOIN e ON f.u = e.edst
         |  WHERE NOT EXISTS (SELECT 1 FROM r2 x
         |    WHERE x.v = f.v AND x.u = e.esrc)),
         |cnt AS (
         |  SELECT v, 1000000 * COUNT(*) AS h, COUNT(*) AS n FROM f1 GROUP BY v
         |  UNION ALL
         |  SELECT v, 500000 * COUNT(*) AS h, COUNT(*) AS n FROM f2 GROUP BY v
         |  UNION ALL
         |  SELECT v, 333333 * COUNT(*) AS h, COUNT(*) AS n FROM f3 GROUP BY v),
         |agg AS (SELECT v, CAST(SUM(h) AS BIGINT) AS harmonic_micro,
         |    CAST(SUM(n) AS BIGINT) AS n_reached
         |  FROM cnt GROUP BY v)
         |SELECT n.node,
         |  COALESCE(a.harmonic_micro, 0) AS harmonic_micro,
         |  COALESCE(a.n_reached, 0) AS n_reached,
         |  CAST(1 AS INTEGER) AS ball_ok,
         |  CAST(1 AS INTEGER) AS harm_ok
         |FROM nodes n LEFT JOIN agg a ON n.node = a.v
         |ORDER BY n.node""".stripMargin,

    "q209c_effective_diameter" ->
      // exact N(d) via the same unrolled BFS (qty >= 47 slice) +
      // floor-micro interpolated 90% effective diameter; sketch
      // verdicts restated as literal 1-flags (q209b's pattern)
      s"""WITH hi AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk
         |  FROM lineitem WHERE l_quantity >= 48),
         |raw AS (SELECT x.sk AS a, y.sk AS b FROM hi x JOIN hi y
         |  ON x.ok = y.ok AND x.sk < y.sk),
         |e AS MATERIALIZED (SELECT esrc, edst FROM (
         |  SELECT a AS esrc, b AS edst FROM raw WHERE a != b
         |  UNION SELECT b, a FROM raw WHERE a != b)),
         |nodes AS MATERIALIZED (SELECT DISTINCT esrc AS node FROM e),
         |r0 AS MATERIALIZED (SELECT node AS v, node AS u FROM nodes),
         |f1 AS MATERIALIZED (SELECT DISTINCT r.v, e.esrc AS u
         |  FROM r0 r JOIN e ON r.u = e.edst
         |  WHERE NOT EXISTS (SELECT 1 FROM r0 x
         |    WHERE x.v = r.v AND x.u = e.esrc)),
         |r1 AS MATERIALIZED (SELECT v, u FROM r0 UNION SELECT v, u FROM f1),
         |f2 AS MATERIALIZED (SELECT DISTINCT f.v, e.esrc AS u
         |  FROM f1 f JOIN e ON f.u = e.edst
         |  WHERE NOT EXISTS (SELECT 1 FROM r1 x
         |    WHERE x.v = f.v AND x.u = e.esrc)),
         |r2 AS MATERIALIZED (SELECT v, u FROM r1 UNION SELECT v, u FROM f2),
         |f3 AS MATERIALIZED (SELECT DISTINCT f.v, e.esrc AS u
         |  FROM f2 f JOIN e ON f.u = e.edst
         |  WHERE NOT EXISTS (SELECT 1 FROM r2 x
         |    WHERE x.v = f.v AND x.u = e.esrc)),
         |nv AS (SELECT COUNT(*) AS n0 FROM nodes),
         |c1 AS (SELECT COUNT(*) AS c FROM f1),
         |c2 AS (SELECT COUNT(*) AS c FROM f2),
         |c3 AS (SELECT COUNT(*) AS c FROM f3),
         |nf AS (
         |  SELECT 0 AS d, n0 AS n_pairs FROM nv
         |  UNION ALL SELECT 1, n0 + c1.c FROM nv CROSS JOIN c1
         |  UNION ALL SELECT 2, n0 + c1.c + c2.c
         |    FROM nv CROSS JOIN c1 CROSS JOIN c2
         |  UNION ALL SELECT 3, n0 + c1.c + c2.c + c3.c
         |    FROM nv CROSS JOIN c1 CROSS JOIN c2 CROSS JOIN c3),
         |tgt AS (SELECT n_pairs * 9000 AS target FROM nf WHERE d = 3),
         |steps AS (SELECT d, n_pairs AS n,
         |    LAG(n_pairs) OVER (ORDER BY d) AS n_prev FROM nf),
         |eff AS (SELECT CAST(CASE WHEN s.n_prev IS NULL THEN 0 ELSE
         |    (s.d - 1) * 1000000 +
         |      ((t.target - s.n_prev * 10000) * 100)
         |        // (s.n - s.n_prev) END AS BIGINT)
         |    AS eff_diameter_micro
         |  FROM steps s CROSS JOIN tgt t
         |  WHERE s.n * 10000 >= t.target
         |    AND (s.n_prev IS NULL OR s.n_prev * 10000 < t.target)
         |  ORDER BY s.d LIMIT 1)
         |SELECT nf.d, CAST(nf.n_pairs AS BIGINT) AS n_pairs,
         |  CAST(1 AS INTEGER) AS nf_ok, eff.eff_diameter_micro
         |FROM nf CROSS JOIN eff ORDER BY nf.d""".stripMargin
  )
}
