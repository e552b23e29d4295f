package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph primitives beyond connected components
  * ([[graft.dedup.Dedup.connectedComponents]]) and triangle counting
  * ([[graft.operators.DedupQueries]] q66): the link-analysis family.
  *
  * PageRank here is FIXED-POINT INTEGER PageRank: all mass is carried
  * as scaled longs and every per-edge contribution is an integer floor
  * division. Two reasons, both scale-driven:
  *
  *  - '''Reproducibility.''' Double-precision PageRank sums per-edge
  *    contributions, so the result depends on reduce order — re-runs on
  *    a different partitioning (or a different engine) drift in the low
  *    bits, which poisons hash-style regression gates and makes
  *    curation decisions ("drop the bottom decile by rank") flap.
  *    Integer sums are associative-exact: ANY partitioning, ANY engine
  *    with 64-bit integer division produces bit-identical ranks.
  *  - '''Honest error bound.''' The floor division discards < 1 scaled
  *    unit per out-edge per round — with scale 1e9 that is a relative
  *    error < outdeg/1e9 per vertex-round, far below any ranking
  *    decision threshold, and (unlike float drift) deterministic.
  *
  * The iteration shape is the standard one: contributions are an
  * edges⋈ranks equi-join on `src` partitioned by key, the new rank a
  * partial-aggregated `sum` shuffled on `dst` — per round, one join
  * exchange (the degree-annotated edge table is materialized once and
  * reused) and one agg exchange, both on vertex keys. No driver-side
  * state, no collects; rounds are a fixed count, so the lineage depth
  * is bounded and needs no checkpoint truncation.
  */
object GraphOps {

  /** Fixed-point PageRank over a directed edge multiset.
    *
    * @param vertices one column `id` (LongType); every vertex receives
    *                 the teleport base even with no in-edges
    * @param edges    columns `src`, `dst`; parallel edges are honored
    *                 (multigraph semantics — each copy carries its own
    *                 contribution). Dangling vertices (no out-edges)
    *                 simply leak their damped mass, the conventional
    *                 simplification; symmetrize the input for undirected
    *                 graphs and none are dangling.
    * @param iters    number of synchronous rounds (fixed, so both the
    *                 plan size and the oracle unrolling are bounded)
    * @param scale    fixed-point scale for the initial rank of every
    *                 vertex. With damping 85/100 the total mass is
    *                 bounded by n·scale, so `scale` must satisfy
    *                 85·n·scale < 2^63 — at scale 1e9 that holds to
    *                 n ≈ 10^8 vertices; shrink `scale` for larger
    *                 graphs (documented contract, enforced below
    *                 against the actual vertex count).
    * @return (id, pr) with `pr` the scaled long rank after `iters`
    *         rounds
    */
  def pageRankScaled(vertices: DataFrame, edges: DataFrame, iters: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"pageRankScaled: iters must be >= 1, got $iters")
    require(scale >= 1000L, s"pageRankScaled: scale too small ($scale)")
    val base = scale * 15L / 100L

    // Degree-annotated edges AND the vertex set are loop-invariant
    // operands of every round's joins — materialize both once
    // (localCheckpoint also truncates the upstream generator lineage
    // out of all later plans; without it each round re-runs the vertex
    // scan). At lake scale these are the persisted, vertex-bucketed
    // graph layout.
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesD = edges.join(outdeg, "src").localCheckpoint()
    val verts = vertices.select(col("id")).localCheckpoint()

    // Overflow guard on the REAL vertex count (cheap: verts is already
    // materialized). 85·n·scale < 2^63.
    val n = verts.count()
    require(n == 0 || scale <= Long.MaxValue / 100L / n,
      s"pageRankScaled: scale=$scale overflows 64-bit mass at n=$n vertices"
        + " — pass a smaller scale")

    var pr = verts.select(col("id"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      val sums = edgesD
        .join(pr, edgesD("src") === pr("id"))
        .select(col("dst"), expr("pr div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
      pr = verts
        .join(sums, verts("id") === sums("dst"), "left")
        .select(verts("id"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
    }
    pr
  }

  /** Personalized (topic-sensitive) PageRank, Haveliwala 2002: the
    * teleport mass lands ONLY on the seed set, so the stationary
    * ranks measure proximity to the seeds — the "find more documents
    * like this curated set" signal. Same fixed-point integer contract
    * as [[pageRankScaled]] (same exchanges per round, same floor-
    * division exactness, same overflow guard shape); the only change
    * is the per-vertex base term: `scale·15/100` for seeds, 0
    * otherwise, and the initial mass likewise seeded.
    *
    * @param seeds one column `id` — the personalization set; vertices
    *              not reachable from it converge to rank 0
    */
  def personalizedPageRankScaled(vertices: DataFrame, edges: DataFrame,
      seeds: DataFrame, iters: Int, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"personalizedPageRankScaled: iters must be >= 1, got $iters")
    require(scale >= 1000L, s"personalizedPageRankScaled: scale too small ($scale)")
    val base = scale * 15L / 100L

    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesD = edges.join(outdeg, "src").localCheckpoint()
    val verts = vertices.select(col("id"))
      .join(seeds.select(col("id").as("__seed_id")),
        col("id") === col("__seed_id"), "left")
      .select(col("id"), col("__seed_id").isNotNull.as("is_seed"))
      .localCheckpoint()

    val n = verts.count()
    require(n == 0 || scale <= Long.MaxValue / 100L / n,
      s"personalizedPageRankScaled: scale=$scale overflows 64-bit mass at n=$n"
        + " vertices — pass a smaller scale")

    val seedBase = when(col("is_seed"), lit(base)).otherwise(lit(0L))
    var pr = verts.select(col("id"),
      when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to iters) {
      val sums = edgesD
        .join(pr, edgesD("src") === pr("id"))
        .select(col("dst"), expr("pr div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
      pr = verts
        .join(sums, verts("id") === sums("dst"), "left")
        .select(verts("id"),
          (seedBase + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
    }
    pr
  }

  /** One synchronous round of majority-vote label propagation
    * (Raghavan et al. 2007's update rule, single round so the result
    * is a pure function of the input — no convergence/oscillation
    * semantics to pin): each unlabeled vertex takes the most frequent
    * label among its labeled in-neighbors, ties to the smallest
    * label; labeled vertices keep theirs. The weak-supervision
    * primitive: a small trusted labeled set + a similarity/link graph
    * → labels for the 1-hop frontier. Shape: one edges⋈labels join
    * exchange, one (dst, label) partial-agg, one argmax partial-agg —
    * all keyed, nothing quadratic.
    *
    * @param labeled (id, label) for the seeded subset; labels may be
    *                any orderable type (strings included), which is
    *                why the argmax is max-votes-then-min-label (two
    *                dst-keyed partial aggs) rather than the numeric
    *                struct-max trick — a negated second field does
    *                not exist for strings
    * @param edges   directed (src, dst); symmetrize for undirected
    * @return (id, label, origin) — origin `seed`, `propagated`, or
    *         `unlabeled` (label null)
    */
  def labelPropagationRound(vertices: DataFrame, edges: DataFrame,
      labeled: DataFrame): DataFrame = {
    val counts = edges
      .join(labeled.select(col("id").as("src"), col("label")), Seq("src"))
      .groupBy(col("dst"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val maxv = counts.groupBy(col("dst")).agg(max(col("votes")).as("mv"))
    val votes = counts.join(maxv, Seq("dst"))
      .filter(col("votes") === col("mv"))
      .groupBy(col("dst"))
      .agg(min(col("label")).as("won"))
      .select(col("dst").as("id"), col("won"))
    vertices.select(col("id"))
      .join(labeled.withColumnRenamed("label", "own"), Seq("id"), "left")
      .join(votes, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("own"), col("won")).as("label"),
        when(col("own").isNotNull, lit("seed"))
          .when(col("won").isNotNull, lit("propagated"))
          .otherwise(lit("unlabeled")).as("origin"))
  }

  /** Bounded k-core PEELING: `rounds` synchronous rounds of "drop every
    * vertex whose degree is below k, restrict the edges to survivors" —
    * the density filter that separates a dup-CLIQUE's tightly knit
    * core from chain/star periphery (CC lumps both into one
    * component; the k-core does not). Bounded rounds, not
    * run-to-fixpoint, for the same reason PageRank fixes its iteration
    * count (q101): the oracle unrolls the identical rounds, and each
    * extra round is one more degree-count exchange + one semi-join —
    * cost is rounds × (one keyed agg + two semi-joins), every stage
    * partial-aggregated and keyed, nothing all-pairs. Each round's
    * edge set is localCheckpointed: round r+1's plan must not replay
    * rounds 1..r (and lineage would otherwise double per round).
    *
    * Returns the degree table of the FINAL edge set — (id, degree) for
    * every vertex that still has an edge after `rounds` peels. Degree
    * counts edge MULTIPLICITY (parallel edges count twice), matching
    * the oracle's plain count over the same multiset.
    *
    * @param edges directed (src, dst); symmetrize for undirected
    *              degree semantics
    */
  /** Bounded-round BFS from a seed set: after `rounds` synchronous
    * frontier expansions, (id, depth) for every vertex reached, depth =
    * number of hops from the NEAREST seed. The distance primitive the
    * membership primitives lack (CC says "same component", PageRank
    * says "how central" — this says "how FAR"): hop distance from a
    * trusted/flagged seed set is the standard contamination-radius /
    * trust-propagation measure over a near-dup graph. Per round: one
    * keyed join (edges ⋈ frontier) + one min-depth aggregate, both
    * partial-agg'd and keyed, nothing all-pairs; only the CURRENT
    * frontier (depth = round-1) expands, so settled vertices never
    * re-join. Each round localCheckpoints — round r+1's plan must not
    * replay rounds 1..r. Bounded rounds, not run-to-fixpoint, for the
    * q101/q136 reason: the oracle unrolls the identical rounds.
    *
    * @param edges directed (src, dst); symmetrize for undirected hops
    * @param seeds one `id` column; depth-0 vertices
    */
  def bfsDepth(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "bfsDepth: rounds must be >= 1")
    var visited = seeds.select(col("id"), lit(0L).as("d")).localCheckpoint()
    for (r <- 1 to rounds) {
      val frontier = visited.filter(col("d") === (r - 1))
        .withColumnRenamed("id", "src")
      val expanded = edges.join(frontier, Seq("src"))
        .select(col("dst").as("id"), lit(r.toLong).as("d"))
      visited = visited.unionAll(expanded)
        .groupBy(col("id")).agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    visited.select(col("id"), col("d").as("depth"))
  }

  /** Bounded-rounds Bellman–Ford single-source shortest paths over
    * integer edge weights: after R rounds, `dist` holds the exact
    * shortest distance USING AT MOST R HOPS — a deterministic,
    * well-defined result whether or not the graph has converged (the
    * q101/q136/[[bfsDepth]] bounded-rounds contract; an oracle can
    * unroll the identical min-relaxation recurrence). Unlike
    * [[bfsDepth]] every round relaxes the FULL settled set (a shorter
    * path can arrive late through a heavier prefix), so each round is
    * one keyed join + one min aggregate, localCheckpointed so round
    * r+1 never replays rounds 1..r. O(rounds) keyed exchanges — the
    * 1000-executor shape for bounded-diameter reachability with costs.
    *
    * @param edges directed (src, dst, w) with numeric weight w
    *              (bounded-hop Bellman–Ford is exact for any weights —
    *              negative ones simply mean "shortest within R hops");
    *              symmetrize for undirected graphs
    * @param seeds one `id` column; distance-0 vertices
    */
  def sssp(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "sssp: rounds must be >= 1")
    // schema contract up front: a misnamed column would otherwise fail
    // deep inside round 1's join with an unhelpful analysis error
    for (c <- Seq("src", "dst", "w"))
      require(edges.columns.contains(c),
        s"sssp: edges must have columns (src, dst, w); missing '$c' in " +
          s"[${edges.columns.mkString(", ")}]")
    require(edges.schema("w").dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"sssp: weight column 'w' must be numeric, got ${edges.schema("w").dataType.sql}")
    require(seeds.columns.contains("id"),
      s"sssp: seeds must have an 'id' column, got [${seeds.columns.mkString(", ")}]")
    var dist = seeds.select(col("id"), lit(0L).as("d")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = edges.join(dist.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), (col("d") + col("w")).as("d"))
      dist = dist.unionAll(relaxed)
        .groupBy(col("id")).agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    dist.select(col("id"), col("d").as("dist"))
  }

  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "kCorePeel: k and rounds must be >= 1")
    var e = edges.select(col("src"), col("dst")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("v"))
      e = e.join(keep.withColumnRenamed("v", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .select(col("src").as("id"), col("degree"))
  }
}
