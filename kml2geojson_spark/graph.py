"""Distributed connected components (dedup-cluster labeling).

Near-duplicate pairs (SimHash/MinHash/cosine) are edges; the training-
data pipeline needs the connected COMPONENTS to pick one keeper per
cluster. The reference has no graph operators (it is a KML converter,
/root/reference/kml2geojson/main.py); this is part of the §2.3-style
extension surface.

Algorithm: iterative min-label propagation — every node starts labeled
with its own id; each round, a node takes the min of its label and its
neighbours' labels; converged when nothing changes. Each round is one
hash join (edges ⋈ labels on src) + one groupBy-min — both shuffles on
the node id, so Catalyst reuses the hash partitioning across rounds.
Rounds needed = graph diameter (near-dup clusters are shallow — star- or
clique-like — so typically 2-5). Lineage is truncated per round with
``localCheckpoint`` so the plan does not grow unboundedly; on a real
cluster use ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()``
for fault-tolerant truncation instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, *, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iters: int = 50) -> DataFrame:
    """Label every node that appears in ``edges`` with the minimum node
    id reachable from it. Output: (node, component), component = min id
    of the node's connected component. Deterministic; equals the
    transitive-closure min a recursive-CTE oracle computes.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (e.union(e.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
           .distinct()
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")))

    converged = False
    for _ in range(max_iters):
        nbr = (sym.join(labels, sym["src"] == labels["node"])
               .select(F.col("dst").alias("node"), F.col("label")))
        new_labels = (labels.unionByName(nbr)
                      .groupBy("node").agg(F.min("label").alias("label"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # one hop per round: rounds needed = distance to the component's
        # min-id node. Returning silently here would hand back WRONG
        # labels (duplicate docs kept across what is really one cluster).
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "the graph has a longer min-label path — raise max_iters")
    return labels.select(F.col("node"), F.col("label").alias("component"))


def connected_components_star(edges: DataFrame, *, src: str = "doc_a",
                              dst: str = "doc_b",
                              max_iters: int = 30) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log² n) rounds INDEPENDENT of graph diameter, where
    min-label propagation needs one round per hop. Same output as
    :func:`connected_components`: (node, component = min id of the
    node's component); use this variant when clusters can be chains
    (e.g. transitive near-dup threads) rather than shallow stars.

    Each round is two groupBy-min + join passes over the current edge
    set; the edge set only shrinks toward the final star forest, and
    lineage is truncated per round.

    - large-star(u): every neighbor v > u re-attaches to
      m = min(N(u) ∪ {u})
    - small-star(u): over edges kept as (u ≥ v): every v (and u)
      attaches to m = min of that neighborhood ∪ {u}
    """
    raw = edges.select(F.col(src).cast("long").alias("u"),
                       F.col(dst).cast("long").alias("v"))
    # node universe from the UNFILTERED edges: a node appearing only in
    # a self-loop must still receive its (singleton) component row,
    # exactly like connected_components
    nodes = (raw.select(F.col("u").alias("node"))
             .union(raw.select("v")).distinct()
             .localCheckpoint(eager=True))
    e = (raw.where(F.col("u") != F.col("v"))
         .distinct()
         .localCheckpoint(eager=True))

    def large_star(ed: DataFrame) -> DataFrame:
        sym = ed.union(ed.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
        m = (sym.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        return (sym.join(m, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v"))
                .distinct())

    def small_star(ed: DataFrame) -> DataFrame:
        canon = ed.select(F.greatest("u", "v").alias("u"),
                          F.least("u", "v").alias("v"))
        m = (canon.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        attach_nbrs = (canon.join(m, "u")
                       .select(F.col("v").alias("u"),
                               F.col("m").alias("v")))
        attach_self = m.select(F.col("u"), F.col("m").alias("v"))
        return (attach_nbrs.union(attach_self)
                .where(F.col("u") != F.col("v"))
                .distinct())

    # Convergence = the edge SET is stable round-over-round. The exact
    # two-sided exceptAll comparison costs two extra shuffles of the
    # full edge set EVERY round; instead each round computes a cheap
    # order-independent fingerprint (count + two independently-salted
    # modular xxhash64 sums — one map-side-combined agg over the
    # already-checkpointed edges, no shuffle of edge rows) and only
    # when the fingerprint repeats runs the EXACT one-sided confirm:
    # both sets are distinct(), so equal counts + cur ⊆ nxt ⇒ equal.
    # A differing fingerprint proves the sets differ (sound to
    # continue); a colliding fingerprint merely triggers the exact
    # check — correctness never rests on the hash.
    def _fingerprint(ed: DataFrame) -> tuple:
        r = ed.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.pmod(F.xxhash64("u", "v", F.lit(1)),
                                    F.lit(1_000_000_007))
                             .cast("decimal(38,0)")),
                       F.lit(0)).alias("s1"),
            F.coalesce(F.sum(F.pmod(F.xxhash64("u", "v", F.lit(2)),
                                    F.lit(1_000_000_009))
                             .cast("decimal(38,0)")),
                       F.lit(0)).alias("s2")).first()
        return (r["n"], r["s1"], r["s2"])

    converged = False
    cur = e
    cur_fp = _fingerprint(cur)
    for _ in range(max_iters):
        nxt = small_star(large_star(cur)).localCheckpoint(eager=True)
        nxt_fp = _fingerprint(nxt)
        same = (nxt_fp == cur_fp
                and cur.exceptAll(nxt).limit(1).count() == 0)
        prev = cur
        cur, cur_fp = nxt, nxt_fp
        prev.unpersist()
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "rounds (expected O(log^2 n)); raise max_iters")
    # converged edge set is a star forest: (u=v_node, v=center)
    labels = (cur.select(F.col("u").alias("node"),
                         F.col("v").alias("component"))
              .groupBy("node").agg(F.min("component").alias("component")))
    centers = (nodes.join(labels, "node", "left_anti")
               .select("node", F.col("node").alias("component")))
    out = labels.unionByName(centers).localCheckpoint(eager=True)
    cur.unpersist()
    nodes.unpersist()
    e.unpersist()
    return out


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             n_iters: int = 3, damping_micro: int = 850_000) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list with PURE
    INTEGER arithmetic — scores in micro-units (node init 1_000_000),
    per-edge contribution ``(score · damping_micro) div (1e6 · deg)``
    — so every engine (JVM, DuckDB, numpy) reproduces the identical
    BIGINT scores: float PageRank sums in nondeterministic partial-
    aggregate order and would never hash-match an oracle.

    Semantics: ``n_iters`` synchronous power-iteration rounds of
    ``score' = (1e6 - damping_micro) + Σ_in contrib``; dangling-node
    mass is dropped, not redistributed (documented deviation from the
    textbook formulation — the ranking a dedup/link-analysis pass
    needs, not the exact eigenvector).

    Scale shape: out-degrees are one map-side-combinable aggregate;
    each round is one hash join of scores to edges on the source key
    followed by one sum on the destination key — both shuffles stay
    on node-id keys so AQE/partitioning reuse applies, and lineage is
    truncated per round (same rationale as
    :func:`connected_components`). Integer overflow headroom: total
    mass is ~1e6·|nodes|, so scores stay far below int64 until
    ~10^12 nodes funnel into one sink.

    Output: (node, score_micro) for every node in src ∪ dst.
    """
    if n_iters < 0:
        raise ValueError("n_iters must be >= 0")
    if not 0 <= damping_micro <= 1_000_000:
        raise ValueError("damping_micro must be in [0, 1e6]")
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .distinct().localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    esrc = e.join(deg, "src")
    base = 1_000_000 - damping_micro
    scores = nodes.withColumn("score_micro", F.lit(1_000_000).cast("long"))
    for _ in range(n_iters):
        contrib = (esrc.join(scores,
                             esrc["src"] == scores["node"])
                   .select(F.col("dst").alias("node"),
                           F.expr(f"(score_micro * {damping_micro}L) div "
                                  f"(1000000L * out_deg)").alias("_c")))
        scores = (nodes.join(contrib.groupBy("node")
                             .agg(F.sum("_c").alias("_in")), "node", "left")
                  .select("node",
                          (F.lit(base) + F.coalesce(F.col("_in"), F.lit(0)))
                          .cast("long").alias("score_micro"))
                  .localCheckpoint(eager=True))
    return scores


def triangle_count(edges: DataFrame, *, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list — the classic link-analysis clustering signal (the reference
    has no graph surface; §2.3-style extension).

    Algorithm: node-iterator with DEGREE ORIENTATION — every undirected
    edge is oriented from its (degree, id)-smaller endpoint to the
    larger, wedges are enumerated at the smaller endpoint, and a wedge
    (a→b, a→c) closes iff the oriented edge (b→c) exists. Each triangle
    a ≺ b ≺ c is found exactly once (only one of (b→c)/(c→b) exists).

    Scale shape: degree orientation bounds every node's out-degree by
    O(√m) even on power-law graphs, so the wedge self-join on the
    source key never explodes on hubs — this is *structural* skew
    handling, stronger than salting (the hot key simply stops being
    the join key). Three shuffles total: the degree aggregate, the
    wedge self-join on ``a``, and the closing semi-join on (b, c).
    All joins are equi-joins; no windows, no Python.

    Output: (node, n_triangles) for every node in ≥ 1 triangle.
    """
    e = (edges.select(F.least(F.col(src), F.col(dst)).cast("long").alias("u"),
                      F.greatest(F.col(src), F.col(dst)).cast("long").alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct())
    deg = (e.select(F.col("u").alias("node"))
           .unionAll(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = (e.join(du, "u").join(dv, "v")
                .select(F.when(u_first, F.col("u")).otherwise(F.col("v"))
                        .alias("a"),
                        F.when(u_first, F.col("v")).otherwise(F.col("u"))
                        .alias("b")))
    o1 = oriented.select(F.col("a"), F.col("b"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("c"))
    wedges = (o1.join(o2, "a").where(F.col("b") != F.col("c")))
    tris = wedges.join(oriented.select(F.col("a").alias("b"),
                                       F.col("b").alias("c")),
                       ["b", "c"], "left_semi")
    corners = tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))


def common_neighbor_similarity(edges: DataFrame, *, left: str = "src",
                               right: str = "dst",
                               min_common: int = 1,
                               max_degree: int | None = None) -> DataFrame:
    """Jaccard similarity of right-side neighborhoods for pairs of
    left-side nodes in a bipartite edge list — the classic
    link-prediction / entity-resolution signal ("customers who share
    suppliers"). ENTIRELY integer arithmetic: jaccard_milli =
    (1000·|N(a)∩N(b)|) div (|N(a)|+|N(b)|−|∩|) — no float ever, so
    results are bit-exact on any engine and any partitioning.

    Scale shape: one distinct (one shuffle), degree hash-aggregate,
    then the wedge self-join keyed on the RIGHT node — candidate pairs
    are generated per shared neighbor, never all-pairs. A hot right
    node (every customer buys from supplier X) blows up the wedge
    count quadratically, so ``max_degree`` ENFORCES hub pruning in the
    engine: right nodes with more than ``max_degree`` left neighbors
    are dropped BEFORE the wedge join, bounding every bucket of the
    self-join to ``max_degree²`` pair candidates. Hubs carry no
    similarity signal (a neighbor shared by everyone distinguishes
    nothing — the same inverse-frequency argument as tf-idf), but
    pruning them does change n_common/jaccard for pairs that shared
    one, so the cap is opt-in; left degrees are computed on the FULL
    edge set so the denominator stays the true neighborhood size.
    Pair counting is one hash-aggregate on (a, b) with map-side
    combine; degrees come back via two token-key joins.

    Output: (node_a, node_b, n_common, jaccard_milli) with
    node_a < node_b and n_common >= min_common.
    """
    e = (edges.select(F.col(left).cast("long").alias("l"),
                      F.col(right).cast("long").alias("r"))
         .distinct())
    deg = e.groupBy("l").agg(F.count(F.lit(1)).alias("d"))
    we = e
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError(f"max_degree must be >= 1, got {max_degree}")
        keep = (e.groupBy("r").agg(F.count(F.lit(1)).alias("_rd"))
                .where(F.col("_rd") <= max_degree).select("r"))
        we = e.join(keep, "r", "left_semi")
    w1 = we.select(F.col("l").alias("node_a"), "r")
    w2 = we.select(F.col("l").alias("node_b"), "r")
    pairs = (w1.join(w2, "r")
             .where(F.col("node_a") < F.col("node_b"))
             .groupBy("node_a", "node_b")
             .agg(F.count(F.lit(1)).alias("n_common"))
             .where(F.col("n_common") >= min_common))
    da = deg.select(F.col("l").alias("node_a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("l").alias("node_b"), F.col("d").alias("d_b"))
    return (pairs.join(da, "node_a").join(db, "node_b")
            .select("node_a", "node_b", "n_common",
                    F.expr("(1000 * n_common) div (d_a + d_b - n_common)")
                    .alias("jaccard_milli")))


def adamic_adar(edges: DataFrame, *, left: str = "src",
                right: str = "dst",
                min_common: int = 1,
                max_degree: int | None = None) -> DataFrame:
    """Adamic–Adar link-prediction score for pairs of left-side nodes
    in a bipartite edge list — :func:`common_neighbor_similarity`'s
    frequency-weighted sibling: each shared right-side neighbor ``w``
    contributes ``1 / ln(deg(w))`` instead of 1, so rare shared
    neighbors dominate (the same inverse-frequency argument as
    tf-idf). The reference (a KML converter,
    /root/reference/kml2geojson/main.py) has no graph surface; this
    extends the §2.4 link-prediction family.

    Determinism: the per-neighbor weight is integerized ONCE as
    ``w_micro = floor(10⁶ / ln(d))`` (d ≥ 2 for any shared neighbor,
    so ln(d) ≥ ln 2 > 0) and the pair score is an exact BIGINT sum of
    those micro-weights — addition-order independent, so bit-exact
    across engines and partitionings. ln routes through libm, but a
    last-ulp difference flips the floor only if 10⁶/ln(d) sits
    exactly on an integer boundary for some integer d — no such d
    exists in the 2⁶³ range of interest.

    Scale shape: mirrors :func:`common_neighbor_similarity` — one
    distinct, one right-degree hash-aggregate joined back onto the
    edges (token-key join), then the wedge self-join keyed on the
    right node: candidates are generated per shared neighbor, never
    all-pairs. ``max_degree`` prunes hub right-nodes BEFORE the wedge
    join (each bucket then holds ≤ max_degree² candidates); hubs
    carry the least Adamic–Adar weight anyway (1/ln d → 0), so the
    cap deletes the flattest part of the signal first. Pair scoring
    is one (a, b) hash-aggregate with map-side combine.

    Output: (node_a, node_b, n_common, aa_micro BIGINT) with
    node_a < node_b and n_common >= min_common.
    """
    e = (edges.select(F.col(left).cast("long").alias("l"),
                      F.col(right).cast("long").alias("r"))
         .distinct())
    rdeg = e.groupBy("r").agg(F.count(F.lit(1)).alias("_rd"))
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError(f"max_degree must be >= 1, got {max_degree}")
        rdeg = rdeg.where(F.col("_rd") <= max_degree)
    # deg 1 right-nodes cannot be shared; dropping them up front also
    # keeps ln(d) strictly positive.
    rdeg = rdeg.where(F.col("_rd") >= 2).withColumn(
        "_w", F.floor(F.lit(1_000_000.0)
                      / F.log(F.col("_rd").cast("double"))).cast("long"))
    we = e.join(rdeg, "r")
    w1 = we.select(F.col("l").alias("node_a"), "r", "_w")
    w2 = we.select(F.col("l").alias("node_b"), "r")
    return (w1.join(w2, "r")
            .where(F.col("node_a") < F.col("node_b"))
            .groupBy("node_a", "node_b")
            .agg(F.count(F.lit(1)).alias("n_common"),
                 F.sum("_w").alias("aa_micro"))
            .where(F.col("n_common") >= min_common))


def bfs_hops(edges: DataFrame, sources: DataFrame, *,
             src: str = "src", dst: str = "dst",
             node: str = "node",
             max_hops: int = 8,
             directed: bool = False) -> DataFrame:
    """Breadth-first hop distance from a SET of source nodes: label
    every node reachable within ``max_hops`` undirected (default) or
    directed hops with its minimum hop count — the "blast radius" /
    influence-propagation primitive (which suppliers sit within 2
    hops of these customers; which docs share a near-dup chain with a
    contaminated seed) beside :func:`connected_components`' global
    clustering.

    Algorithm: frontier-relaxation BFS. ``dist`` starts as the
    sources at hop 0; each round joins the CURRENT FRONTIER (only the
    nodes first reached last round — not the whole dist table)
    against the edges and anti-joins already-visited nodes. Rounds =
    min(eccentricity, max_hops), each one equi-join + one distinct,
    both shuffles on the node id so the partitioning is reused;
    lineage is truncated per round with ``localCheckpoint`` exactly
    like :func:`connected_components` (use a real checkpoint dir on a
    cluster). The frontier SHRINKS as the search saturates and the
    loop exits early on an empty frontier, so max_hops is a cap, not
    a cost.

    Semantics match a depth-capped recursive-CTE shortest path:
    node's hops = min over all expansion paths ≤ max_hops. Sources
    not present in the edge table still report hop 0. NULL ids are
    dropped.

    Output: (node, hops INT) — one row per reached node.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint(eager=True)
    frontier = (sources.select(F.col(node).alias("node"))
                .where(F.col("node").isNotNull())
                .distinct()
                .localCheckpoint(eager=True))
    dist = frontier.select("node", F.lit(0).alias("hops"))
    for hop in range(1, max_hops + 1):
        nxt = (e.join(frontier, e["src"] == frontier["node"])
               .select(F.col("dst").alias("node"))
               .distinct()
               .join(dist.select("node"), "node", "left_anti")
               .localCheckpoint(eager=True))
        if nxt.limit(1).count() == 0:
            break
        frontier = nxt
        dist = dist.unionByName(
            nxt.select("node", F.lit(hop).alias("hops")))
    return dist.select("node", F.col("hops").cast("int").alias("hops"))


def hits_scores(edges: DataFrame, *, src: str = "src", dst: str = "dst",
                n_iters: int = 2) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) with UNNORMALIZED
    integer power iteration: starting from hub score 1 on every
    source node, alternate ``auth = Σ hub(in-neighbors)`` and
    ``hub = Σ auth(out-neighbors)`` for ``n_iters`` rounds — the
    directed-importance complement to :func:`pagerank` (which ranks
    by random-walk mass, not by the hub/authority split a citation or
    link graph wants).

    Determinism: the classic HITS normalizes by the L2 norm each
    round — a float whose partial-sum order varies across engines and
    partitionings. Dropping the normalization keeps every score an
    exact BIGINT (after k rounds the authority score counts weighted
    alternating paths of length 2k−1), and the RANKING is identical —
    normalization rescales, never reorders. Caller bounds growth:
    scores reach ~(d_max²)^k, so keep ``n_iters`` small (2–3, as with
    integer :func:`pagerank`) — ANSI mode raises on overflow, never
    wraps.

    Scale shape: per half-round ONE equi-join on the node id + one
    map-side-combinable hash-agg, partitioning reused across rounds;
    duplicate edges collapse first (one distinct). No window, no
    driver loop over data.

    Output: (node, hub BIGINT, auth BIGINT) — every node of the edge
    set, 0 for the side it never plays.
    """
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    hub = (e.select(F.col("src").alias("node")).distinct()
           .withColumn("score", F.lit(1).cast("long")))
    auth = None
    for _ in range(n_iters):
        auth = (e.join(hub, e["src"] == hub["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("score").alias("score"))
                .localCheckpoint(eager=True))
        hub = (e.join(auth, e["dst"] == auth["node"])
               .groupBy(F.col("src").alias("node"))
               .agg(F.sum("score").alias("score"))
               .localCheckpoint(eager=True))
    return (hub.select("node", F.col("score").alias("hub"))
            .join(auth.select("node", F.col("score").alias("auth")),
                  "node", "full_outer")
            .select("node",
                    F.coalesce(F.col("hub"), F.lit(0)).alias("hub"),
                    F.coalesce(F.col("auth"), F.lit(0)).alias("auth")))


def neighbor_label_vote(edges: DataFrame, labels: DataFrame, *,
                        src: str = "src", dst: str = "dst",
                        node: str = "node", label: str = "label",
                        directed: bool = False) -> DataFrame:
    """One round of semi-supervised label propagation: every
    UNLABELED node with at least one labeled neighbor takes the
    majority label of its labeled neighbors (ties break to the
    smallest label) — the cheap "spread the known languages / topics
    / spam flags one hop" primitive between a full
    :func:`connected_components` collapse (too coarse: one label per
    component) and an ML classifier (too heavy for a first pass).

    Deterministic: the vote count is an exact BIGINT over the
    DISTINCT neighbor set (a duplicate edge is not a double vote),
    and the argmax is ``min(struct(-votes, label))`` — an order-free
    aggregate, not a sort. Already-labeled nodes are never
    re-labeled (anti-join). NULL ids/labels drop.

    Scale shape: one distinct on the symmetrized edges, one equi-join
    labels→edges, one anti-join against the labeled set, two
    hash-aggs — all shuffles on the node id. Iterate externally for
    multi-hop spread (each round is this function).

    Output: (node, label, votes BIGINT) — newly labeled nodes only.
    """
    e = (edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
         .where(F.col("_s").isNotNull() & F.col("_d").isNotNull()))
    if not directed:
        e = e.union(e.select(F.col("_d").alias("_s"),
                             F.col("_s").alias("_d")))
    e = e.distinct()
    lab = (labels.select(F.col(node).alias("_n"), F.col(label).alias("_l"))
           .where(F.col("_n").isNotNull() & F.col("_l").isNotNull())
           .distinct())
    votes = (e.join(lab, e["_s"] == lab["_n"])
             .select(F.col("_d").alias("node"), F.col("_l").alias("label"))
             .join(lab.select(F.col("_n").alias("node")).distinct(),
                   "node", "left_anti")
             .groupBy("node", "label")
             .agg(F.count(F.lit(1)).alias("votes")))
    best = (votes.groupBy("node")
            .agg(F.min(F.struct((-F.col("votes")).alias("nv"),
                                F.col("label").alias("label")))
                 .alias("_b")))
    return (best.select("node", F.col("_b.label").alias("label"),
                        (-F.col("_b.nv")).alias("votes")))


def bellman_ford_hops(edges: DataFrame, sources: DataFrame, *,
                      src: str = "src", dst: str = "dst",
                      weight: str = "weight", node: str = "node",
                      max_hops: int = 6,
                      directed: bool = True) -> DataFrame:
    """Minimum-cost path within ``max_hops`` edges from a seed set
    over INTEGER edge weights — bounded-horizon Bellman-Ford, the
    weighted upgrade of :func:`bfs_hops` (cheapest routing cost,
    strongest influence chain) without the unbounded iteration a full
    shortest-path would need.

    Semantics: cost(v) = min total weight over all paths from any
    seed to v using at most ``max_hops`` edges (the depth-capped
    recursive-CTE shortest path). Weights must be INTEGER (floats
    raise — costs stay exact BIGINTs) and NON-NEGATIVE (negative
    weights raise: with a hop cap the relaxation is still
    well-defined, but a negative-cycle answer would silently depend
    on the cap — refuse instead). Seeds cost 0.

    Scale shape: per round ONE equi-join of the CURRENT BEST table
    against the edges + one min hash-aggregate, then a join back to
    keep only improved nodes as the next frontier — the classic
    distributed Bellman-Ford step, shuffles keyed on the node id
    throughout, lineage truncated per round (``localCheckpoint``).
    Early exit when no cost improves.

    Output: (node, cost BIGINT, hops INT — the hop count at which the
    minimum cost was first achieved).
    """
    from pyspark.sql.types import DoubleType, FloatType

    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    fields = {f.name: f for f in edges.schema.fields}
    if isinstance(fields[weight].dataType, (DoubleType, FloatType)):
        raise ValueError(
            f"bellman_ford_hops: {weight!r} is floating-point — "
            "integerize first (exact integer costs are the "
            "determinism contract)")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                      F.col(weight).cast("long").alias("w"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                & F.col("w").isNotNull()))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"), "w"))
    e = (e.groupBy("src", "dst").agg(F.min("w").alias("w"))
         .localCheckpoint(eager=True))
    if e.where(F.col("w") < 0).limit(1).count() > 0:
        raise ValueError(
            "bellman_ford_hops: negative edge weights are not "
            "supported (hop-capped relaxation would silently depend "
            "on the cap)")
    best = (sources.select(F.col(node).alias("node"))
            .where(F.col("node").isNotNull()).distinct()
            .select("node", F.lit(0).cast("long").alias("cost"),
                    F.lit(0).alias("hops"))
            .localCheckpoint(eager=True))
    frontier = best
    for hop in range(1, max_hops + 1):
        cand = (e.join(frontier, e["src"] == frontier["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min(F.col("cost") + F.col("w")).alias("cost"))
                .withColumn("hops", F.lit(hop)))
        improved = (cand.alias("c")
                    .join(best.alias("b"), "node", "left")
                    .where(F.col("b.cost").isNull()
                           | (F.col("c.cost") < F.col("b.cost")))
                    .select("node", F.col("c.cost").alias("cost"),
                            F.col("c.hops").alias("hops"))
                    .localCheckpoint(eager=True))
        if improved.limit(1).count() == 0:
            break
        best = (best.alias("b")
                .join(improved.alias("i"), "node", "full_outer")
                .select(
                    F.coalesce(F.col("b.node"), F.col("i.node"))
                    .alias("node"),
                    F.when(F.col("i.cost").isNull(), F.col("b.cost"))
                    .when(F.col("b.cost").isNull(), F.col("i.cost"))
                    .otherwise(F.least(F.col("b.cost"), F.col("i.cost")))
                    .alias("cost"),
                    F.when(F.col("i.cost").isNull(), F.col("b.hops"))
                    .when(F.col("b.cost").isNull(), F.col("i.hops"))
                    .when(F.col("i.cost") < F.col("b.cost"),
                          F.col("i.hops"))
                    .otherwise(F.col("b.hops")).alias("hops"))
                .localCheckpoint(eager=True))
        frontier = improved
    return best.select("node", "cost", F.col("hops").cast("int").alias("hops"))


def k_core(edges: DataFrame, *, src: str = "src", dst: str = "dst",
           k: int = 2, rounds: int = 20) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node keeps degree ≥ k — the standard graph-cleaning trim
    (peel off weakly-connected spam/boilerplate tendrils before
    :func:`pagerank`/:func:`triangle_count`; the 2-core drops all
    dangling chains).

    Algorithm: iterative peeling — each round recomputes degrees over
    the surviving edge set and drops nodes below k together with
    their incident edges; a fixpoint IS the k-core (Matula–Beck).
    ``rounds`` bounds the iteration; on a non-fixpoint after
    ``rounds`` the operator RAISES (returning a partial peel would
    silently be wrong) — extra rounds after convergence are no-ops,
    so any generous bound gives identical results, which also makes
    the semantics exactly replayable by a ``rounds``-times unrolled
    SQL oracle.

    Scale shape: per round one degree hash-aggregate + one semi-join
    of the edge set against surviving nodes (both keyed on the node
    id, partitioning reused), lineage truncated per round
    (``localCheckpoint``), early exit at the fixpoint. Duplicate and
    NULL edges collapse first; self-loops are dropped (a self-loop
    would grant its node degree from itself and never peel).

    Output: (node, degree BIGINT — the node's degree INSIDE the
    core).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                & (F.col("src") != F.col("dst"))))
    sym = (e.union(e.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
           .distinct()
           .localCheckpoint(eager=True))
    converged = False
    for _ in range(rounds):
        deg = (sym.groupBy(F.col("src").alias("node"))
               .agg(F.count(F.lit(1)).alias("degree")))
        keep = deg.where(F.col("degree") >= k)
        dropped = deg.where(F.col("degree") < k).limit(1).count()
        if dropped == 0:
            converged = True
            break
        kn = keep.select("node")
        sym = (sym.join(kn, sym["src"] == kn["node"], "left_semi"))
        kn2 = keep.select("node")
        sym = (sym.join(kn2, sym["dst"] == kn2["node"], "left_semi")
               .localCheckpoint(eager=True))
    if not converged:
        raise RuntimeError(
            f"k_core did not reach a fixpoint in {rounds} rounds — "
            "raise `rounds` (each round peels at least one node, so "
            "the worst case is the node count)")
    return (sym.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("degree")))


def clustering_coefficient(edges: DataFrame, *, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Per-node local clustering coefficient
    ``2·triangles(v) / (deg(v)·(deg(v)−1))`` over an undirected edge
    list — the neighborhood-density signal that separates hub nodes
    (high degree, low closure: spam, aggregators) from community
    cores (high closure), complementing :func:`triangle_count`'s raw
    counts with the degree-normalized view.

    Exactness: degree and triangle counts are exact BIGINTs; the
    coefficient is ONE fixed IEEE expression of those integers —
    bit-identical across engines and partitionings.

    Scale shape: the degree aggregate and the degree-oriented wedge
    join of :func:`triangle_count` (hub skew handled structurally —
    the hot node stops being the join key), plus one left equi-join
    of the triangle counts back onto the degree frame. No windows,
    no Python.

    Output: (node, degree, n_triangles, clustering_coeff) for every
    node with ≥ 1 edge — coefficient NULL when degree < 2 (the ratio
    is undefined), 0.0 for closed-triangle-free nodes.
    """
    e = (edges.select(F.least(F.col(src), F.col(dst)).cast("long")
                      .alias("u"),
                      F.greatest(F.col(src), F.col(dst)).cast("long")
                      .alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct())
    deg = (e.select(F.col("u").alias("node"))
           .unionAll(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    tri = triangle_count(edges, src=src, dst=dst)
    j = deg.join(tri, "node", "left")
    nt = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    d = F.col("degree").cast("double")
    cc = F.when(F.col("degree") >= 2,
                F.lit(2.0) * nt.cast("double") / (d * (d - F.lit(1.0))))
    return j.select("node", "degree", nt.alias("n_triangles"),
                    cc.alias("clustering_coeff"))


def degree_assortativity(edges: DataFrame, *, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Degree assortativity coefficient of an undirected graph — the
    Pearson correlation of degrees across edge endpoints (Newman):
    positive = hubs link to hubs (social networks), negative = hubs
    link to leaves (hub-and-spoke infrastructure, dup-cluster
    stars). One global diagnostic for the near-dup graphs this
    package builds.

    Determinism: with the symmetrized ordered endpoint pairs
    (M = 2m of them), the marginals coincide, so
    ``r = (M·Σdᵤdᵥ − (Σdᵤ)²) / (M·Σdᵤ² − (Σdᵤ)²)`` — the sufficient
    statistics are exact DECIMAL(38,0) sums of exact BIGINT degrees,
    and r is ONE division of exact integers — bit-identical across
    engines. NULL when the graph is degree-regular (zero variance).

    Scale shape: the degree hash-aggregate, one equi-join per
    endpoint to attach degrees (hash joins on the node id), one
    global aggregate. No windows, no Python.

    Output: ONE row (m_edges, assortativity).
    """
    e = (edges.select(F.least(F.col(src), F.col(dst)).cast("long")
                      .alias("u"),
                      F.greatest(F.col(src), F.col(dst)).cast("long")
                      .alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct())
    sym = e.unionAll(e.select(F.col("v").alias("u"),
                              F.col("u").alias("v")))
    deg = (sym.groupBy(F.col("u").alias("node"))
           .agg(F.count(F.lit(1)).alias("d")))
    du = deg.select(F.col("node").alias("u"),
                    F.col("d").cast("decimal(38,0)").alias("du"))
    dv = deg.select(F.col("node").alias("v"),
                    F.col("d").cast("decimal(38,0)").alias("dv"))
    j = sym.join(du, "u").join(dv, "v")
    s = j.agg(F.count(F.lit(1)).alias("_m2"),
              F.sum("du").alias("_sx"),
              F.sum(F.col("du") * F.col("du")).alias("_sxx"),
              F.sum(F.col("du") * F.col("dv")).alias("_sxy"))
    m2 = F.col("_m2").cast("decimal(38,0)")
    num = m2 * F.col("_sxy") - F.col("_sx") * F.col("_sx")
    den = m2 * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    r = F.when(den > 0, num.cast("double") / den.cast("double"))
    return s.select((F.col("_m2") / F.lit(2)).cast("long")
                    .alias("m_edges"), r.alias("assortativity"))


def graph_reciprocity(edges: DataFrame, *, src: str = "src",
                      dst: str = "dst") -> DataFrame:
    """Directed-graph reciprocity — the fraction of (deduplicated,
    loop-free) directed edges whose reverse edge also exists: mutual
    follows on a social graph, bidirectional links on the web,
    request/reply pairs in a service mesh. Near 0 = broadcast
    structure, near 1 = mutual-consent structure.

    Determinism: edge universe is DISTINCT directed pairs with
    ``u ≠ v`` and non-NULL endpoints; per UNORDERED pair one
    conditional hash-aggregate counts each direction (0/1 each), a
    reciprocated pair contributes 2 reciprocal edges; all counts
    exact BIGINT, the ratio ONE fixed division.

    Scale shape: one distinct hash-agg, one (min,max)-keyed hash-agg
    with map-side combine, one global agg. NO self-join — the
    classic reverse-edge equi-join is replaced by the unordered-key
    aggregation, halving the shuffle.

    Output: ONE row (n_edges, n_reciprocal_edges, n_mutual_pairs,
    reciprocity) — reciprocity NULL on an empty edge set.
    """
    e = (edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull()
                     & (F.col(src) != F.col(dst)))
         .select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
         .distinct())
    pair = e.groupBy(
        F.least("_u", "_v").alias("_a"),
        F.greatest("_u", "_v").alias("_b")).agg(
        F.sum(F.when(F.col("_u") < F.col("_v"), 1).otherwise(0))
        .alias("_fwd"),
        F.sum(F.when(F.col("_u") > F.col("_v"), 1).otherwise(0))
        .alias("_rev"))
    both = (F.col("_fwd") > 0) & (F.col("_rev") > 0)
    s = pair.agg(
        F.sum(F.col("_fwd") + F.col("_rev")).alias("n_edges"),
        F.sum(F.when(both, 2).otherwise(0))
        .alias("n_reciprocal_edges"),
        F.sum(F.when(both, 1).otherwise(0)).alias("n_mutual_pairs"))
    return s.select(
        F.coalesce(F.col("n_edges"), F.lit(0)).alias("n_edges"),
        F.coalesce(F.col("n_reciprocal_edges"), F.lit(0))
        .alias("n_reciprocal_edges"),
        F.coalesce(F.col("n_mutual_pairs"), F.lit(0))
        .alias("n_mutual_pairs"),
        F.when(F.coalesce(F.col("n_edges"), F.lit(0)) > 0,
               F.col("n_reciprocal_edges").cast("double")
               / F.col("n_edges").cast("double")).alias("reciprocity"))


def lpa_communities(edges: DataFrame, *, src: str = "src",
                    dst: str = "dst", n_rounds: int = 3) -> DataFrame:
    """Fixed-round SYNCHRONOUS label-propagation community detection
    over an undirected graph (edges are symmetrized; self-loops
    dropped): every node starts labeled with its own id, and each
    round simultaneously adopts the label most frequent among its
    neighbors' PREVIOUS-round labels, ties broken by the minimum
    label. Bounded rounds make the pass deterministic and replayable
    (the :func:`bellman_ford_hops` rule — asynchronous/converge-to-
    fixpoint LPA is run-order dependent and could never hash-match an
    oracle); callers wanting coarser communities raise ``n_rounds``.

    Complements :func:`connected_components` (pure reachability) and
    :func:`neighbor_label_vote` (ONE round seeded by external
    labels): LPA discovers density clusters inside a single connected
    component with no seed labels at all — the dedup/link-analysis
    "which docs form a citation clique" question.

    Scale shape: per round ONE hash join of the label frame to the
    symmetrized edge list on the source key, one map-side-combinable
    (node, label) count, one node-key arg-min hash-agg
    (``min(struct(-count, label))`` — no window, no sort), lineage
    truncated per round. All shuffles stay on node-id keys. Counts
    are BIGINT; nothing floats.

    Output: (node, community) for every endpoint, BIGINT both.
    """
    if n_rounds < 0:
        raise ValueError("n_rounds must be >= 0")
    e0 = (edges.select(F.col(src).cast("long").alias("a"),
                       F.col(dst).cast("long").alias("b"))
          .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                 & (F.col("a") != F.col("b"))))
    sym = (e0.union(e0.select(F.col("b").alias("a"),
                              F.col("a").alias("b")))
           .distinct().localCheckpoint(eager=True))
    nodes = sym.select(F.col("a").alias("node")).distinct() \
        .localCheckpoint(eager=True)
    labels = nodes.withColumn("community", F.col("node"))
    for _ in range(n_rounds):
        cnt = (sym.join(labels.withColumnRenamed("node", "a"), "a")
               .groupBy(F.col("b").alias("node"), "community")
               .agg(F.count(F.lit(1)).alias("_c")))
        labels = (cnt.groupBy("node")
                  .agg(F.min(F.struct((-F.col("_c")).alias("_nc"),
                                      F.col("community").alias("_l")))
                       .alias("_best"))
                  .select("node", F.col("_best._l").alias("community"))
                  .localCheckpoint(eager=True))
    return labels



def two_hop_reach(edges: DataFrame, *, src: str = "src",
                  dst: str = "dst",
                  max_mid_degree: int | None = None) -> DataFrame:
    """Per-node distinct reach within one and two directed hops —
    the neighborhood-size profile behind friend-of-friend
    recommendation fan-out, influence estimates, and join-cardinality
    planning on the follow graph. The reference (a KML converter,
    /root/reference/kml2geojson/main.py) has no graph surface; this
    extends the §2.4 graph family beside :func:`bfs_hops` (which
    needs seed nodes; this profiles EVERY node).

    Semantics: ``reach1`` = |{v : src→v}|; ``reach2`` = |{v : v
    reachable in ≤ 2 hops, v ≠ src}| — self-loops and the node
    itself never count, and a node reachable both directly and
    through a middle node counts once (set union, not path count).

    Scale shape: edges dedup once; the 2-hop wedge is ONE equi-join
    keyed on the middle node, then a distinct + count-distinct
    hash-aggregate per source. The middle-node key is the blowup
    axis (a hub with in×out = d² forms d² wedge rows in one bucket):
    ``max_mid_degree`` prunes middle nodes whose OUT-degree exceeds
    the cap BEFORE the join — an explicit approximation (documented,
    the :func:`common_neighbor_similarity` discipline), because at
    100 TB the exact answer through celebrity hubs is a different
    algorithm (HLL per frontier). NULL endpoints drop.

    Output: (node, reach1, reach2) — one row per node with ≥ 1
    out-edge.
    """
    e = (edges
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .select(F.col(src).cast("long").alias("a"),
                 F.col(dst).cast("long").alias("b"))
         .where(F.col("a") != F.col("b"))
         .distinct())
    mid = e
    if max_mid_degree is not None:
        if max_mid_degree < 1:
            raise ValueError(
                f"max_mid_degree must be >= 1, got {max_mid_degree}")
        deg = (e.groupBy("a").agg(F.count(F.lit(1)).alias("_d"))
               .where(F.col("_d") <= max_mid_degree).select("a"))
        mid = e.join(deg, "a")
    two = (e.alias("e1")
           .join(mid.alias("e2"), F.col("e1.b") == F.col("e2.a"))
           .select(F.col("e1.a").alias("a"), F.col("e2.b").alias("b"))
           .where(F.col("a") != F.col("b")))
    reach = (e.unionByName(two).distinct()
             .groupBy("a").agg(F.count(F.lit(1)).alias("reach2")))
    one = e.groupBy("a").agg(F.count(F.lit(1)).alias("reach1"))
    return (one.join(reach, "a")
            .select(F.col("a").alias("node"), "reach1", "reach2"))


def negative_edge_samples(edges: DataFrame, *, k: int = 5,
                          src: str = "src", dst: str = "dst",
                          seed: int = 42) -> DataFrame:
    """Deterministic negative sampling for link prediction — the
    training-data complement of :func:`adamic_adar` /
    :func:`common_neighbor_similarity`: for every left node, up to
    ``k`` right nodes it is NOT connected to, drawn uniformly from
    the observed right-node set by md5 (no RNG, so the sample is
    identical across runs, engines and partitionings — the
    :func:`~kml2geojson_spark.textops.split_assign_col` property a
    reproducible training set needs).

    Candidate j for node s is right-node index
    ``md5(f"neg:{seed}:{s}:{j}") mod |dst|`` (60-bit hex prefix, the
    package's md5→BIGINT idiom); true edges and self-pairs are then
    removed by ONE left-anti join, so a node can yield FEWER than
    ``k`` negatives (collisions with its true edges or duplicate
    draws — callers oversample ``k`` accordingly; for hub nodes whose
    degree approaches |dst| rejection sampling is the wrong tool
    anyway). Duplicate draws of the same (s, candidate) collapse.

    Scale shape: the right-node index is a two-phase global
    row_number over the DISTINCT right nodes (cardinality = node
    count, not edge count); candidates are a k-literal explode joined
    to that index on the computed position (equi-join), then one
    anti-join against the edge set. All md5/bit math inside
    whole-stage codegen.

    Output: (src, neg_dst, try_idx INT) — distinct (src, neg_dst).
    """
    from pyspark.sql import Window

    if k < 1 or k > 1000:
        raise ValueError(f"k must be in [1, 1000], got {k}")
    e = (edges
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .select(F.col(src).cast("long").alias("s"),
                 F.col(dst).cast("long").alias("d"))
         .distinct())
    dnodes = (e.select("d").distinct()
              .withColumn("_idx", F.row_number().over(
                  Window.orderBy(F.col("d").asc())) - 1))
    n_d = dnodes.groupBy().agg(F.count(F.lit(1)).alias("_nd"))
    srcs = e.select("s").distinct()
    cand = (srcs.crossJoin(F.broadcast(n_d))
            .withColumn("_j", F.explode(F.array(
                *[F.lit(j) for j in range(k)])))
            .withColumn("_h", F.conv(F.substring(F.md5(F.concat_ws(
                ":", F.lit("neg"), F.lit(seed), F.col("s"),
                F.col("_j"))), 1, 15), 16, 10).cast("long"))
            .withColumn("_idx", F.pmod(F.col("_h"), F.col("_nd"))))
    withd = (cand.join(dnodes, "_idx")
             .where(F.col("s") != F.col("d"))
             .select("s", "d", F.col("_j").cast("int").alias("try_idx")))
    neg = withd.join(e, ["s", "d"], "left_anti")
    return (neg.groupBy("s", "d")
            .agg(F.min("try_idx").alias("try_idx"))
            .select(F.col("s").alias(src), F.col("d").alias("neg_dst"),
                    "try_idx"))


def neighbor_jaccard(edges: DataFrame, *, left: str = "src",
                     right: str = "dst",
                     min_common: int = 1,
                     max_degree: int | None = None) -> DataFrame:
    """Jaccard neighborhood similarity for pairs of left-side nodes
    in a bipartite edge list — |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — the
    set-overlap member of the link-prediction family beside
    :func:`common_neighbor_similarity` (raw count) and
    :func:`adamic_adar` (inverse-log-frequency weight). Jaccard
    penalizes promiscuous nodes symmetrically: two hubs sharing 10
    of their 10,000 neighbors score ~0.0005, not 10.

    Determinism: intersection and degrees are exact BIGINT counts;
    the score is ONE correctly-rounded IEEE division — bit-exact
    cross-engine (the :func:`grubbs_test` rule, no quantization
    needed).

    Scale shape: identical to :func:`adamic_adar` — dedup, one
    left-degree hash-aggregate joined back per pair, wedge self-join
    keyed on the shared right node (candidates per shared neighbor,
    never all-pairs), ``max_degree`` prunes hub right-nodes BEFORE
    the wedge join. Union size comes from the two degrees and the
    intersection (inclusion–exclusion), so no second pass over
    edges.

    Output: (node_a, node_b, n_common BIGINT, deg_a BIGINT,
    deg_b BIGINT, jaccard DOUBLE) with node_a < node_b and
    n_common >= min_common.
    """
    e = (edges.select(F.col(left).cast("long").alias("l"),
                      F.col(right).cast("long").alias("r"))
         .distinct())
    ldeg = e.groupBy("l").agg(F.count(F.lit(1)).alias("_ld"))
    rdeg = e.groupBy("r").agg(F.count(F.lit(1)).alias("_rd"))
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError(f"max_degree must be >= 1, got {max_degree}")
        rdeg = rdeg.where(F.col("_rd") <= max_degree)
    rdeg = rdeg.where(F.col("_rd") >= 2).select("r")
    we = e.join(rdeg, "r")
    w1 = we.select(F.col("l").alias("node_a"), "r")
    w2 = we.select(F.col("l").alias("node_b"), "r")
    pairs = (w1.join(w2, "r")
             .where(F.col("node_a") < F.col("node_b"))
             .groupBy("node_a", "node_b")
             .agg(F.count(F.lit(1)).alias("n_common"))
             .where(F.col("n_common") >= min_common))
    da = ldeg.select(F.col("l").alias("node_a"),
                     F.col("_ld").alias("deg_a"))
    db = ldeg.select(F.col("l").alias("node_b"),
                     F.col("_ld").alias("deg_b"))
    out = pairs.join(da, "node_a").join(db, "node_b")
    uni = (F.col("deg_a") + F.col("deg_b") - F.col("n_common")) \
        .cast("double")
    return out.select("node_a", "node_b", "n_common", "deg_a",
                      "deg_b",
                      (F.col("n_common").cast("double") / uni)
                      .alias("jaccard"))
