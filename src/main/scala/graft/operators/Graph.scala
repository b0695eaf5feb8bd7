package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics as Pregel-on-DataFrames — the companion to
 * [[Dedup.connectedComponents]] for WEIGHTED vertex importance: a crawl
 * pipeline ranks domains by link authority before allocating crawl budget,
 * and a dedup pipeline ranks cluster members by co-purchase/citation
 * centrality when picking canonical survivors.
 *
 * Engine-exact discipline: ranks are FIXED-POINT integers (scaled by
 * `scale`), the damping factor is basis points, and every update is integer
 * multiply/divide — so an N-iteration run is a pure function of the edge
 * set, reproducible bit-for-bit on any engine, any partitioning (float
 * PageRank drifts with summation order; integer sums are order-free).
 */
object Graph {

  /**
   * Fixed-point PageRank over a directed edge list, `iterations` rounds of
   *
   *   rank'(v) = ((10000 − dampingBp)·scale
   *               + dampingBp · Σ_{u→v} (rank(u) div outdeg(u))) div 10000
   *
   * with rank_0(v) = scale (the "total mass = N·scale" formulation — no
   * divide-by-N, so the arithmetic never leaves the integers). Dangling
   * vertices (no out-edges) keep receiving the teleport term but distribute
   * nothing — their mass leaks, the standard simplified PageRank a ranking
   * (not a probability) consumer uses; exact replay only needs the oracle
   * to apply the same rule. Parallel edges collapse (`distinct`);
   * self-loops are legal and count toward outdeg.
   *
   * SCALE SHAPE: the (src, dst, outdeg) frame is built ONCE and
   * checkpointed — iterations never re-derive degrees. Each round is (a)
   * one hash join of the O(V) rank frame against edges on src, shuffling
   * only (id, rank) pairs; (b) one map-side-combined sum keyed by dst; (c)
   * one left join back onto the vertex list for the teleport term — three
   * exchanges of keys-proportional frames per round, payloads never move,
   * and `localCheckpoint` truncates the growing lineage exactly as the
   * connected-components loop does. At 1000 executors the per-round cost is
   * the edge shuffle; V-proportional frames spill, nothing collects to the
   * driver.
   *
   * Overflow envelope (caller's contract): a hub's inflow approaches
   * V·scale, and the update multiplies it by dampingBp BEFORE the div —
   * so dampingBp·V·scale must stay below 2^63 (at the defaults, V up to
   * ~1e9 vertices; shrink `scale` to rank larger graphs).
   *
   * Returns one row per vertex: (id, rank_scaled).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, dampingBp: Int = 8500,
               scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50], got $iterations")
    require(dampingBp >= 0 && dampingBp <= 10000,
      s"dampingBp must be in [0,10000], got $dampingBp")
    require(scale >= 1L, s"scale must be positive, got $scale")
    // checkpoint the edge projection ONCE; vertices and the degree frame
    // derive from the materialized RDD instead of re-running scan+distinct
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val vertices = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val withDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    var rank = vertices.withColumn("rank", lit(scale))
    for (_ <- 1 to iterations) {
      val inflow = withDeg.join(rank, col("src") === col("id"))
        .select(col("dst").as("id"), expr("rank div outdeg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__inflow"))
      rank = vertices.join(inflow, Seq("id"), "left_outer")
        .select(col("id"), expr(
          s"((${10000 - dampingBp}L * ${scale}L) + ${dampingBp}L * coalesce(__inflow, 0L)) div 10000L"
        ).as("rank"))
        .localCheckpoint()
    }
    rank.select(col("id"), col("rank").as("rank_scaled"))
  }

  /**
   * WEIGHTED fixed-point PageRank: flow along an edge is proportional to
   * its integer weight — rank'(v) = ((10000 − dampingBp)·scale +
   * dampingBp · Σ_{u→v} (rank(u)·w(u,v) div totw(u))) div 10000, where
   * totw(u) is u's total out-weight — so a co-purchase edge backed by 10
   * shared parts carries 10× the authority of a single-part edge, the
   * weighting [[pageRank]]'s uniform split cannot express. Same integer
   * discipline (a weight is a COUNT, not a float). CONTRACT: one row per
   * (src, dst) — weights are per-edge facts, so duplicates must be
   * aggregated upstream (a duplicate would double both the edge's flow
   * and totw, silently reweighting the graph); weights must be positive
   * (non-positive rows are dropped).
   *
   * SCALE SHAPE: identical to [[pageRank]] — the weight rides the
   * checkpointed edge frame. Overflow envelope (caller's contract, same
   * class as the q138 sketch-width envelope): BOTH products must stay
   * below 2^63 — the flow term rank(u)·w (rank ≤ V·scale, so
   * V·scale·maxWeight < 2^63) AND the update's dampingBp·inflow
   * (inflow ≤ V·scale, so dampingBp·V·scale < 2^63 — the binding bound
   * at the defaults: V up to ~1e9; shrink `scale` for larger graphs).
   */
  def weightedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iterations: Int,
                       dampingBp: Int = 8500, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50], got $iterations")
    require(dampingBp >= 0 && dampingBp <= 10000,
      s"dampingBp must be in [0,10000], got $dampingBp")
    require(scale >= 1L, s"scale must be positive, got $scale")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("w") > 0L)
      .localCheckpoint()
    val vertices = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val withTot = e
      .join(e.groupBy(col("src")).agg(sum(col("w")).as("totw")), "src")
      .select(col("src"), col("dst"), col("w"), col("totw"))
      .localCheckpoint()
    var rank = vertices.withColumn("rank", lit(scale))
    for (_ <- 1 to iterations) {
      val inflow = withTot.join(rank, col("src") === col("id"))
        .select(col("dst").as("id"), expr("(rank * w) div totw").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__inflow"))
      rank = vertices.join(inflow, Seq("id"), "left_outer")
        .select(col("id"), expr(
          s"((${10000 - dampingBp}L * ${scale}L) + ${dampingBp}L * coalesce(__inflow, 0L)) div 10000L"
        ).as("rank"))
        .localCheckpoint()
    }
    rank.select(col("id"), col("rank").as("rank_scaled"))
  }

  /**
   * PERSONALIZED fixed-point PageRank: teleport mass lands only on the
   * `seeds` vertices (uniformly, `scale` each), so ranks measure proximity
   * TO THE SEED SET rather than global authority — "parts related to the
   * ones THIS customer bought", the relatedness primitive under
   * retrieval-augmentation and crawl-frontier expansion from a trusted
   * site list. Same integer recurrence as [[pageRank]] with
   *
   *   rank'(v) = (seed(v)·(10000 − dampingBp)·scale
   *               + dampingBp · Σ_{u→v} (rank(u) div outdeg(u))) div 10000
   *
   * and rank_0(v) = seed(v)·scale. Seeds not present in the edge set are
   * ignored (they have no edges to propagate over); non-seed vertices
   * never receiving flow stay at rank 0 and ARE returned (rank 0 is
   * information: unreachable from the seed set).
   *
   * SCALE SHAPE: identical to [[pageRank]] — the seed flag is one extra
   * boolean on the O(V) vertex frame (left-outer against the distinct
   * seed ids, coalesced to false); seeds shuffle as (id) only. Same
   * dampingBp·V·scale < 2^63 overflow envelope as [[pageRank]] (total
   * personalized mass is bounded by the global-teleport case).
   */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, iterations: Int,
                           dampingBp: Int = 8500, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50], got $iterations")
    require(dampingBp >= 0 && dampingBp <= 10000,
      s"dampingBp must be in [0,10000], got $dampingBp")
    require(scale >= 1L, s"scale must be positive, got $scale")
    require(seeds.columns.length == 1, "seeds must be a single-column frame of vertex ids")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val seedIds = seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .where(col("id").isNotNull).distinct()
    val vertices = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .join(seedIds.withColumn("__seed", lit(true)), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("__seed"), lit(false)).as("seed"))
      .localCheckpoint()
    val withDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    var rank = vertices
      .select(col("id"), when(col("seed"), lit(scale)).otherwise(lit(0L)).as("rank"))
    for (_ <- 1 to iterations) {
      val inflow = withDeg.join(rank, col("src") === col("id"))
        .select(col("dst").as("id"), expr("rank div outdeg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__inflow"))
      rank = vertices.join(inflow, Seq("id"), "left_outer")
        .select(col("id"), expr(
          s"((CASE WHEN seed THEN ${10000 - dampingBp}L * ${scale}L ELSE 0L END)" +
            s" + ${dampingBp}L * coalesce(__inflow, 0L)) div 10000L"
        ).as("rank"))
        .localCheckpoint()
    }
    rank.select(col("id"), col("rank").as("rank_scaled"))
  }

  /**
   * Multi-source k-hop shortest distances (unweighted BFS as iterated
   * min-propagation): every vertex reachable from the `seeds` set within
   * `maxHops` directed hops gets its exact hop distance — the
   * contamination-spread / crawl-depth primitive ("everything within 3
   * links of a known-bad site"). Deterministic and engine-exact by
   * construction (min over integers).
   *
   * Directionality is the caller's: pass symmetrized edges for undirected
   * reach. Seeds not present in the edge set still appear at distance 0
   * (they are trivially reachable from themselves). Unreached vertices are
   * ABSENT — at 100 TB the reached set is usually far smaller than V, and
   * absence distinguishes "not reached in k" from any sentinel.
   *
   * SCALE SHAPE: per hop, ONLY the newest frontier expands — a vertex
   * first reached at hop h−1 is the only kind that can mint a new
   * minimum at hop h (older vertices already expanded, and re-expanding
   * them can only reproduce larger distances) — so each round joins the
   * frontier slice, not the whole reached set, against the checkpointed
   * edges, then one map-side-combined min; payloads never move, lineage
   * truncated per hop. (No early-exit probe: maxHops is a small constant
   * by contract; the CC-style fingerprint probe would add a job per hop
   * to save at most the tail hops.)
   */
  def hopDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 50, s"maxHops must be in [1,50], got $maxHops")
    require(seeds.columns.length == 1, "seeds must be a single-column frame of vertex ids")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    var dist = seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .where(col("id").isNotNull).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    for (h <- 1 to maxHops) {
      val frontier = dist.where(col("dist") === (h - 1).toLong)
      val next = e.join(frontier, col("src") === col("id"))
        .select(col("dst").as("id"), lit(h.toLong).as("dist"))
      dist = dist.unionByName(next)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /**
   * Global triangle / wedge census over an UNDIRECTED graph (input edges
   * are symmetrized and deduped; self-loops dropped) — the structural
   * audit behind clustering-coefficient quality checks on co-occurrence
   * and co-purchase graphs.
   *
   * SCALE SHAPE: edges are ORIENTED from the (degree, id)-smaller endpoint
   * to the larger before the wedge join — the classic bound that caps every
   * vertex's out-degree at O(√E), so a hub with a million neighbors
   * generates √-bounded candidate pairs instead of deg² (an unoriented
   * wedge join on a hub vertex is the graph analog of the unblocked
   * all-pairs cosine). Each triangle then closes exactly once (its
   * orientation DAG has a unique out-degree-2 vertex). The orientation
   * key is the (degree, id) STRUCT compared lexicographically — no global
   * rank assignment, no single-partition window. Two equi-joins total:
   * wedges on the shared source, closure on the (y, z) pair.
   *
   * Returns ONE row: (n_vertices, n_edges, n_wedges, n_triangles,
   * global_clustering_bp = 3·triangles·10000 div wedges, 0 if no wedges).
   */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("u").as("x")).unionByName(und.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    val keyed = und
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    val oriented = keyed.select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u")).otherwise(col("v")).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v")).otherwise(col("u")).as("dst"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint()
    val wedgePairs = oriented.select(col("src"), col("dst").as("y"), col("ddst").as("dy"))
      .join(oriented.select(col("src"), col("dst").as("z"), col("ddst").as("dz")), "src")
      .where(struct(col("dy"), col("y")) < struct(col("dz"), col("z")))
      .select(col("y"), col("z"))
    val tri = wedgePairs
      .join(oriented.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val base = deg.agg(
      count(lit(1)).as("n_vertices"),
      // coalesce: an empty edge set must census as zeros, not NULLs
      coalesce((sum(col("d")) / 2).cast("long"), lit(0L)).as("n_edges"),
      coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("n_wedges"))
    base.crossJoin(broadcast(tri))
      .withColumn("global_clustering_bp",
        expr("CASE WHEN n_wedges = 0 THEN 0L ELSE (3 * n_triangles * 10000) div n_wedges END"))
  }

  /**
   * Bounded k-core PEELING over an undirected graph: `rounds` synchronous
   * passes each remove every vertex whose CURRENT degree is below `k`
   * (removals cascade round by round — deleting a low-degree vertex can
   * drop its neighbors below k next round). The survivors after enough
   * rounds are exactly the k-core; with a FIXED round budget the result is
   * a deterministic superset of it (documented contract — each round only
   * shrinks, so any vertex peeled is provably outside the k-core, while an
   * unpeeled vertex may still fall in later rounds; [[kCoreExact]] is the
   * run-to-fixpoint sibling when the exact core is required). Production
   * use: prune
   * weakly-connected rim vertices (single-link spam accounts, boilerplate
   * pages hanging off a template hub) before community/centrality
   * analytics; a handful of rounds removes the overwhelming rim mass.
   *
   * SCALE SHAPE: per round, ONE map-side-combined degree count over the
   * live edge frame (the drop set checkpoints before its three consumers)
   * + anti-joins to drop peeled vertices/endpoints — edge-mass
   * proportional, lineage truncated per round, and an empty round ends the
   * loop early (a provable fixpoint). Returns (id, peel_round):
   * 0 for survivors of all `rounds`, otherwise the 1-based round the
   * vertex was peeled in (the rim "depth" — itself a useful feature).
   */
  def kCorePeel(edges: DataFrame, aCol: String, bCol: String,
                k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 50, s"rounds must be in [1,50], got $rounds")
    val (peeled, verts, _) = peelLoop(edges, aCol, bCol, k, rounds)
    peeled.unionByName(verts.withColumn("peel_round", lit(0L)))
  }

  /**
   * EXACT k-core: [[kCorePeel]]'s loop run to its FIXPOINT (the round
   * where nothing peels — after which degrees can never change, so the
   * survivors are exactly the k-core, proven against brute force in
   * GraphSpec). `maxRounds` is a SAFETY VALVE, not a semantic knob: the
   * loop always stops on its own within |V| rounds, and every output row
   * carries `converged` so a valve-capped run (converged = false, result
   * a documented superset) is visible IN the result — q168 gates the
   * flag under the hash oracle. Per-round cost is identical to
   * [[kCorePeel]] (one degree count + anti-joins, checkpoint-truncated);
   * the worst case (a path graph peeling one vertex per round) is
   * O(|V|) rounds, which is why the bounded variant exists for
   * rim-pruning where a superset is fine.
   *
   * Returns (id, peel_round, converged): peel_round 0 for core members,
   * else the 1-based peel round (rim depth).
   */
  def kCoreExact(edges: DataFrame, aCol: String, bCol: String,
                 k: Int, maxRounds: Int = 200): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 10000,
      s"maxRounds must be in [1,10000], got $maxRounds")
    val (peeled, verts, fixpoint) = peelLoop(edges, aCol, bCol, k, maxRounds)
    peeled.unionByName(verts.withColumn("peel_round", lit(0L)))
      .withColumn("converged", lit(fixpoint))
  }

  /** The shared synchronous peel loop. Returns (peeled rows with their
    * 1-based round, surviving vertices, fixpoint-reached flag). */
  private def peelLoop(edges: DataFrame, aCol: String, bCol: String,
      k: Int, rounds: Int): (DataFrame, DataFrame, Boolean) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    // track the LIVE VERTEX set explicitly: a vertex whose every edge died
    // with its peeled neighbors has live-degree 0 and must peel too (edge
    // endpoints alone would silently lose it)
    var verts = und.select(col("u").as("id")).unionByName(und.select(col("v").as("id")))
      .distinct().localCheckpoint()
    var live = und
    var peeled = und.sparkSession.range(0)
      .select(col("id"), lit(0L).as("peel_round")).where(lit(false))
    var r = 1
    var fixpoint = false
    while (r <= rounds && !fixpoint) {
      val deg = live.select(col("u").as("id")).unionByName(live.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("d"))
      // checkpoint the drop set: THREE consumers (peeled union, verts
      // anti-join, both sides of the live anti-join) would otherwise each
      // re-run the degree aggregation
      val drop = verts.join(deg, Seq("id"), "left_outer")
        .where(coalesce(col("d"), lit(0L)) < k).select(col("id"))
        .localCheckpoint()
      if (drop.isEmpty) {
        // an empty round is a provable FIXPOINT: degrees cannot change once
        // nothing peels, so the remaining rounds would be pure wasted work
        // — and the survivors are exactly the k-core
        fixpoint = true
      } else {
        peeled = peeled.unionByName(drop.withColumn("peel_round", lit(r.toLong)))
          .localCheckpoint()
        verts = verts.join(drop, Seq("id"), "left_anti").localCheckpoint()
        live = live
          .join(drop.select(col("id").as("u")), Seq("u"), "left_anti")
          .join(drop.select(col("id").as("v")), Seq("v"), "left_anti")
          .select(col("u"), col("v"))
          .localCheckpoint()
      }
      r += 1
    }
    (peeled, verts, fixpoint)
  }

  /**
   * Synchronous label propagation (community detection), `iterations`
   * fixed rounds over the symmetrized edge set: every vertex starts
   * labeled with its own id and each round adopts the most frequent label
   * among its NEIGHBORS, ties broken by the smallest label — a total,
   * deterministic rule, so the result is a pure function of the edge set
   * (async/random-order LPA is run-dependent; this is the engine-exact
   * variant an auditable pipeline wants). Distinct from connected
   * components: on dense graphs labels converge to community cores, not
   * component minima.
   *
   * SCALE SHAPE: per round, one (id, label) join onto the checkpointed
   * symmetric edges, one map-side-combined (vertex, label) count, and one
   * arg-max keyed by vertex (max of a (count, ~label) struct —
   * `bitwise_not`, not negation, so Long.MinValue labels are safe) — all
   * keys-proportional, lineage truncated per round.
   *
   * Returns (id, label) after the final round.
   */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50], got $iterations")
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val sym = und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint() // (u, v): v is u's neighbor
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      labels = sym.join(labels, sym("v") === labels("id"))
        .groupBy(sym("u"), labels("label")).agg(count(lit(1)).as("__c"))
        .groupBy(col("u").as("id"))
        .agg(max(struct(col("__c"), bitwise_not(col("label")).as("nl"))).as("m"))
        .select(col("id"), bitwise_not(col("m.nl")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
