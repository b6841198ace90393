"""Distributed connected components for dedup clustering.

Near-dup PAIRS are not a dedup policy: pairwise "drop the higher id"
breaks on transitivity (a~b, b~c but not a~c — dropping b and c loses a
representative of the b/c cluster; keeping c contradicts b~c). The
production shape for an LLM corpus is pairs -> connected components ->
keep one canonical doc per component. This module provides the
component step as a first-class distributed operator.

Algorithm: hash-min label propagation over the symmetrized edge list —
every round each node adopts the minimum label in its closed
neighborhood, so the component root's id floods outward; converges in
O(diameter) rounds. Near-dup graphs are dense near-cliques (that is
what "near duplicate" means), so the diameter is small and the round
count is effectively constant; the O(log n) large-star/small-star
variant (Kiveris et al., Connected Components in MapReduce and Beyond,
SoCC'14; pattern in PAPERS.md) is the drop-in upgrade if a pathological
long-chain graph ever matters.

Scale shape per round: one keyed shuffle of the edge list (join on the
node id) and one map-side-combined min-aggregate of the labels —
nothing quadratic, no driver-side graph. The driver loop holds only the
convergence counter, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; ``component`` is
    the minimum node id reachable from ``node`` (the cluster's stable
    canonical representative).

    Nodes with no edges are absent from the output — join the caller's
    universe with ``F.coalesce(component, node)`` for singleton
    semantics (see ``dedup.near_dup_components``).

    Raises ``RuntimeError`` if ``max_iter`` rounds do not converge
    (diameter > max_iter — not a near-dup-shaped graph).
    """
    # Symmetrize via one explode, not union(e, e.reversed): the union
    # form evaluates the caller's edge plan twice (often an expensive
    # pair join — only its exchanges get reused, not the join compute).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("node"), F.col(dst).alias("peer")
                    ),
                    F.struct(
                        F.col(dst).alias("node"), F.col(src).alias("peer")
                    ),
                )
            ).alias("np")
        )
        .select("np.node", "np.peer")
        .where(F.col("node") != F.col("peer"))
        .distinct()
        .persist()
    )
    labels = sym.select("node").distinct().withColumn("label", F.col("node")).persist()
    labels.count()  # materialize so each round starts from a fixed frame

    lbl_t = labels.schema["label"].dataType
    try:
        for _ in range(max_iter):
            msgs = sym.join(labels, "node").select(
                F.col("peer").alias("node"), "label"
            )
            # localCheckpoint (not just persist): each round's frame is
            # built on the previous round's, so without truncation the
            # logical plan DOUBLES per round and planning itself OOMs
            # after ~20 rounds on a long-diameter graph. Checkpointing
            # cuts the lineage to the materialized result — the standard
            # requirement for iterative DataFrame algorithms. (On a
            # cluster with executor loss concerns, swap for reliable
            # checkpoint() against a checkpoint dir.)
            #
            # Convergence costs no extra job: the node's old label rides
            # through the min-aggregate (labels carries exactly one row
            # per node, so min(__old) recovers it) and the changed count
            # is an Observation on the checkpoint's own materialization
            # — one job per round where a join-and-count was a second.
            obs = Observation()
            new = (
                labels.withColumn("__old", F.col("label"))
                .unionByName(
                    msgs.withColumn("__old", F.lit(None).cast(lbl_t))
                )
                .groupBy("node")
                .agg(
                    F.min("label").alias("label"),
                    F.min("__old").alias("__old"),
                )
                .observe(
                    obs,
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.col("label") == F.col("__old"), 0
                            ).otherwise(1)
                        ),
                        F.lit(0),
                    ).alias("changed"),
                )
                .select("node", "label")
                .localCheckpoint(eager=True)
            )
            changed = obs.get["changed"]
            labels.unpersist()
            labels = new
            if changed == 0:
                return labels.select(
                    F.col("node"), F.col("label").alias("component")
                )
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        sym.unpersist()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) by alternating large-star / small-star
    (Kiveris et al., Connected Components in MapReduce and Beyond,
    SoCC'14): converges in O(log n) ROUNDS on any graph shape — the
    scale path when the graph may contain long paths, where
    :func:`connected_components`'s hash-min needs O(diameter) rounds.

    Per round: large-star hooks every node's larger neighbors onto the
    minimum of its closed neighborhood (keyed aggregate + keyed join on
    the symmetrized edge list); small-star then flattens each node's
    smaller neighbors onto that minimum. Both are ordinary keyed
    shuffles; the edge set only shrinks toward the star forest, and
    each round's frame is localCheckpoint'ed (see the lineage note in
    :func:`connected_components`). Fixpoint detection is an
    order-independent (count, xxhash-sum) signature of the edge set.
    """
    def chk_sig(df: DataFrame) -> tuple[DataFrame, tuple]:
        """localCheckpoint ``df`` and return it with its fixpoint
        signature — observed on the checkpoint's own materialization,
        so signing costs no second job per round."""
        obs = Observation()
        chk = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent and overflow-free under ANSI
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias(
                "h"
            ),
        ).localCheckpoint(eager=True)
        m = obs.get
        return chk, (m["n"], m["h"])

    e, sig = chk_sig(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    def large_star(df: DataFrame) -> DataFrame:
        sym = df.unionByName(
            df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(df: DataFrame) -> DataFrame:
        o = df.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m = o.groupBy("u").agg(F.min("v").alias("m"))  # all v < u here
        attach = o.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
        self_edge = m.select(F.col("u"), F.col("m").alias("v"))
        return (
            attach.unionByName(self_edge)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(max_iter):
        e2, sig2 = chk_sig(small_star(large_star(e)))
        e.unpersist()
        e = e2
        if sig2 == sig:
            # fixpoint: a star forest — every edge points node -> root
            roots = e.select(F.col("v").alias("node"), F.col("v").alias("component"))
            return (
                e.select(F.col("u").alias("node"), F.col("v").alias("component"))
                .unionByName(roots)
                .distinct()
            )
        sig = sig2
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering / community-density signal (a node's triangles measure
    how interconnected its neighborhood is; graph-quality curation
    ranks domains by it, spam subgraphs are triangle-poor trees).

    Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11) —
    each canonical edge points from its lower-(degree, id) endpoint to
    the higher, every triangle then has exactly ONE apex whose two
    out-edges cover it, and wedge generation at the apex is a self-join
    of the oriented list on the apex key. Orientation bounds per-node
    out-degree by O(sqrt(m)), so the wedge count is O(m^1.5) WORST
    case instead of Σdeg² — the orientation exists purely to tame the
    hub-skew that kills the naive id-ordered join ("the curse of the
    last reducer"). The closure check is one equi-join of the wedge
    set against the canonical edge list. Counts are exact integers;
    the result is orientation-invariant, so an id-ordered SQL oracle
    matches bit for bit.

    Returns (node, n_tri) for every node with at least one edge
    (isolated nodes have no triangles by definition; left-join the
    caller's universe for 0-rows). Self-loops and duplicate/reversed
    edges are canonicalized away.

    Scale shape: one distinct over the canonical edge list, one
    degree aggregate (single explode pass — the edge list is read
    once for both endpoints), two keyed joins to orient, one keyed
    aggregate collecting each apex's sorted out-neighbor list, then
    wedges emit ROW-LOCALLY from that list (posexplode x slice — the
    measured 3.5x-over-self-join wedge form from link_prediction:
    ordered pairs x < y come free of the sort, and the apex shuffle
    moves each out-list ONCE instead of the oriented edge list
    twice), one closure equi-join, one explode+count. Per-apex
    out-list length is bounded O(sqrt(m)) by the orientation, so a
    collected list row stays KBs even on hub nodes. The canonical
    edge list is persisted (read by the degree, orientation, and
    closure stages); NOTE: that pins one |edges|-sized cache entry
    for the returned frame's lifetime, the pagerank contract.
    """
    c = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = (
        c.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    cd = c.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u").join(
        deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v"
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = cd.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    # row-local wedge emit: collect each apex's sorted out-list once,
    # then posexplode x slice yields every ordered pair x < y without
    # the oriented list's two-sided self-join shuffle (out-lists are
    # distinct post-`distinct()`, so sort order makes x < y strict)
    adj = o.groupBy("a").agg(F.sort_array(F.collect_list("b")).alias("ns"))
    wedges = adj.select(
        "a", "ns", F.posexplode("ns").alias("i", "x")
    ).select(
        "a",
        "x",
        F.explode(F.slice("ns", F.col("i") + 2, F.size("ns"))).alias("y"),
    )
    closure = c.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closure, ["x", "y"])
    per_node = (
        tri.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select("node", F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_tri"))
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Bounded breadth-first search: (node, hops) — the MINIMUM hop
    distance from any seed, for every node within ``hops`` hops over a
    DIRECTED edge list (symmetrize for undirected reach). The k-hop
    neighborhood primitive: blast-radius analysis, crawl frontier
    expansion, "everything within N links of the eval set".

    Frontier-only expansion: round ``i`` joins only the nodes FIRST
    reached at ``i−1`` against the edge list (a node re-reached later
    can never improve its minimum, so re-expanding the full reached
    set — what a declarative unrolled oracle does — is work the
    min-semantics make redundant; results are identical). Distances
    are exact small integers.

    Scale shape per round: one keyed join of the frontier against the
    edge list + one map-side-combined min-aggregate. Small bounds
    (``hops <= lazy_below``, the k-hop-neighborhood norm) build ONE
    lazy plan — no per-round materialization, so the whole walk is a
    single job. Deeper walks switch to the iterative-lineage
    discipline (see connected_components): each round
    localCheckpoints, the previous round unpersists, and an emptied
    frontier early-exits — lineage and cache stay O(1) however deep
    the graph. The loop holds only counters, never rows.
    """
    if hops < 0:
        raise ValueError(f"hops must be >= 0: {hops}")
    lazy = hops <= 8  # plan depth stays trivially plannable below this
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    dist = seeds.select(F.col(node_col).alias("node")).distinct().select(
        "node", F.lit(0).cast("long").alias("hops")
    )
    if not lazy:
        dist = dist.localCheckpoint(eager=True)
    frontier = dist
    for i in range(1, hops + 1):
        expanded = frontier.select(F.col("node").alias("src")).join(e, "src").select(
            F.col("dst").alias("node"), F.lit(i).cast("long").alias("hops")
        )
        # Merge the round via aggregate-then-outer-join instead of
        # union-then-aggregate: the union form re-shuffles the ENTIRE
        # accumulated dist table every round, while here only the
        # round's expansion is aggregated (one exchange) and dist —
        # already hash-partitioned on node from the previous round —
        # merges exchange-free (subset-partitioning rule, r15 opt;
        # shuffled bytes per round drop from |dist|+|expansion| to
        # |expansion|). Identical results: a node present in dist
        # always has hops <= i-1 < i, so coalesce(dist, expansion)
        # IS the min the union form computed.
        cand = expanded.groupBy("node").agg(F.min("hops").alias("__ch"))
        new_dist = (
            dist.join(cand, "node", "full_outer")
            .select("node", F.coalesce("hops", "__ch").alias("hops"))
        )
        if lazy:
            # each round is referenced TWICE downstream (the next
            # union AND the next frontier) — a bare lazy plan would
            # recompute every level 2^k times; a LAZY persist makes
            # the first runtime evaluation of each level feed both
            # consumers while keeping the whole walk one job. Pins
            # `hops` |reached|-sized cache entries for the returned
            # frame's lifetime (the pagerank contract).
            new_dist = new_dist.persist()
        else:
            new_dist = new_dist.localCheckpoint(eager=True)
            dist.unpersist()
        dist = new_dist
        frontier = dist.where(F.col("hops") == i)
        if not lazy and frontier.isEmpty():
            break
    return dist


def kcore(
    edges: DataFrame,
    k: int,
    *,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling (Seidman 1983 coreness): repeatedly
    delete nodes of undirected degree < ``k`` (with their edges) for
    ``rounds`` iterations, then return the surviving nodes still at
    degree >= ``k`` — the dense-substructure filter: spam/link-farm
    detection keeps high cores, influence analysis ranks by coreness,
    and in a near-dup graph the heavy cores are template families.

    Fixed ``rounds`` rather than run-to-fixpoint keeps the operator an
    exact finite recurrence (the pagerank playbook — the oracle
    unrolls the same rounds; peeling is monotone, so R rounds is
    exactly the R-peel prefix of true coreness and converges once no
    round removes a node; size ``rounds`` to the expected peel depth,
    which is small on real graphs). Returns (node, degree) over the
    final edge set — exact integers.

    Per round: one degree aggregate over the survivor edges (a single
    explode pass — the edge list is read ONCE for both endpoints, not
    a two-arm union) + two broadcast semi joins filtering the edge
    list to kept endpoints. Each round's survivor frame persists
    LAZILY: the previous edge list is then referenced THREE times per
    round — the semi-join probe side plus the ``keep`` aggregate
    subtree, which (persist does not truncate the logical plan) is
    rendered inside BOTH broadcast joins — so the plan tree grows as
    ~3^rounds copies of the un-truncated base subtree. Measured
    bounds: 3^5 ≈ 243 copies (this form, 5 rounds) renders fine on a
    default-memory driver, while 5^4 ≈ 625 copies (the FORMER
    5-reference form — two degree-union arms + probe + keep in both
    broadcasts — at only 4 rounds) OOM'd plan RENDERING; the lazy
    cutoff at rounds <= 5 keeps the copy count at or below the
    measured-safe 243, well under the measured-fatal 625. Deeper
    peels switch to the per-round
    eager-localCheckpoint discipline, which truncates lineage at the
    cost of one materialization pass per round. In the lazy regime
    the per-round broadcast exchanges (which must materialize
    ``keep`` anyway) are the only barriers, so the whole peel runs as
    rounds broadcast-build jobs plus one final count, after which
    every superseded round's cache is dropped — only the final edge
    list stays pinned for the returned frame's lifetime (the pagerank
    contract).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1: {rounds}")
    lazy = rounds <= 5
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # lazy persist, not eager localCheckpoint: the eager form pays a
    # full extra materialization pass up front (measured 1.4 s on the
    # 1.2M-edge co-purchase graph — a third of the whole peel), while
    # the lazy cache fills during round 1's first read for free; the
    # base subtree then renders 3^rounds times in the plan string,
    # bounded by the rounds <= 5 lazy cutoff (see docstring)
    e = e.persist() if lazy else e.localCheckpoint(eager=True)
    superseded: list = []

    def degrees(ed: DataFrame) -> DataFrame:
        # explode(array(u, v)) reads the edge list once — halving both
        # the scan count and (load-bearing for the lazy plan) the
        # per-round lineage fan-out vs the two-arm union form
        return (
            ed.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    for _ in range(rounds):
        keep = degrees(e).where(F.col("degree") >= k).select("node")
        # keep is |nodes|-sized — orders of magnitude under the edge
        # list — but it hangs off an aggregate, so the size estimator
        # can't see that and plans SMJ semi joins; the broadcast hints
        # remove the per-round edge-list shuffles. Both semis reference
        # the IDENTICAL keep subtree (join conditions, not per-side
        # renames) so the second broadcast reuses the first's exchange.
        # For graphs whose NODE set alone outgrows the driver
        # (~billions), remove the hints and let the keyed semi join
        # shuffle — that is the seam, not a tuning knob.
        bk = F.broadcast(keep)
        new_e = (
            e.join(bk, F.col("u") == bk["node"], "left_semi")
            .join(bk, F.col("v") == bk["node"], "left_semi")
            .select("u", "v")
        )
        if lazy:
            new_e = new_e.persist()
            superseded.append(e)
        else:
            new_e = new_e.localCheckpoint(eager=True)
            e.unpersist()
        e = new_e
    if lazy:
        # One eager localCheckpoint drives the whole peel now (each
        # round's broadcast barrier fills its predecessor's cache in
        # sequence) AND truncates the ~3^rounds logical plan: the
        # checkpoint blocks are written straight from the just-filled
        # final cache, so it costs what the former driving count()
        # cost — but afterwards an eviction of that cache (memory
        # pressure, executor loss) re-reads stored blocks instead of
        # recomputing the exponential lineage with every intermediate
        # cache already dropped. Unpersisting INSIDE the loop would
        # deregister caches before any job ran (nothing executes
        # lazily until an action) and turn the peel into the same
        # exponential recompute; freeing after the single
        # materialization keeps exactly 1 round pinned. Note the
        # operator therefore runs its jobs EAGERLY at call time (it
        # always did — the peel was count()-driven before).
        final = e.localCheckpoint(eager=True)
        for old in superseded:
            old.unpersist()
        e.unpersist()
        e = final
    return degrees(e).where(F.col("degree") >= k)


def link_prediction_common_neighbors(
    edges: DataFrame,
    *,
    k: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    wedge_filter=None,
) -> DataFrame:
    """Top-``k`` missing links by common-neighbor count, with the
    Jaccard coefficient — the classic structural link-prediction
    baselines (Liben-Nowell & Kleinberg 2003): NON-adjacent node pairs
    sharing many neighbors are the edges most likely to appear (or,
    in a dedup graph, the pairs a noisy pairwise threshold missed —
    candidates for a second-look verify pass).

    Returns (node_a, node_b, common_neighbors, jaccard) with
    node_a < node_b, ranked (common_neighbors desc, node_a, node_b) —
    counts exact, jaccard ``cn/(deg_a + deg_b − cn)`` one IEEE divide.

    Shape at scale — TWO data shuffles total, everything else derives
    row-locally from one cached adjacency frame:

    1. ``adj``: one keyed aggregate collects every node's sorted
       distinct neighbor set (``collect_set`` dedups, so the raw edge
       list needs NO prior distinct shuffle). Degrees are then
       ``size(ns)`` — a projection, not an aggregate — and the
       canonical edge list for the non-edge check is a row-local
       explode of the same frame. Persisted: four consumers (the
       pagerank cache-pin contract).
    2. Wedge pair-count: ordered pairs stream out of each generating
       node's array via a two-level explode (first the neighbor, then
       the strictly-greater suffix of the array — measured ~40%
       faster than the nested transform/slice struct build), then ONE
       map-side-combined (u, v) count shuffle. There is no adjacency
       self-join anywhere. Hub nodes still contribute deg² wedges —
       the inherent cost of common-neighbor scores — and
       ``wedge_filter`` is the containment: a predicate on the
       generating-node column restricting which nodes EMIT wedges
       (e.g. the bipartite projection — wedges only at the low-degree
       side's nodes — or a degree-bounded hub set computed upstream;
       it also bounds the per-row collected arrays). Unrestricted on
       a dense graph the wedge volume itself kills the job whatever
       the plan shape (measured: the sf0.1 co-purchase graph; NOTES
       gotcha).

    The NON-edge restriction costs no join at all: canonical edge rows
    ride the SAME count shuffle as the wedges, weighted by a sentinel
    more negative than any possible wedge count (``-2^40``; a pair's
    wedge count is bounded by the node count, and a canonical edge
    appears exactly once) — after the sum, adjacent pairs are the
    negative ones and one codegen'd filter drops them. Ranking is by
    exact ``cn`` with the (node_a, node_b) total-order tiebreak —
    degrees don't rank — so the TakeOrderedAndProject runs BEFORE the
    degree lookups: the two degree joins touch only the ``k`` winners
    (broadcast the k-row side) against the projection of the cached
    adjacency, never the wedge-count frame.
    """
    sym = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("peer")
    ).unionByName(
        edges.select(F.col(dst_col).alias("node"), F.col(src_col).alias("peer"))
    ).where(F.col("node") != F.col("peer"))
    adj = (
        sym.groupBy("node")
        .agg(F.sort_array(F.collect_set("peer")).alias("ns"))
        .persist()
    )
    deg = adj.select("node", F.size("ns").cast("long").alias("d"))
    hubs = adj if wedge_filter is None else adj.where(wedge_filter)
    # two-level explode: ns is ascending, so pairing each element with
    # its strict suffix emits exactly the ordered pairs u < v
    wedges = (
        hubs.select(F.posexplode("ns").alias("i", "u"), "ns")
        .select(
            "u",
            F.explode(F.slice("ns", F.col("i") + 2, F.size("ns"))).alias("v"),
        )
        .select("u", "v", F.lit(1).cast("long").alias("w"))
    )
    edge_mark = 1 << 40  # > any wedge count (bounded by |nodes|)
    edge_rows = (
        adj.select(F.col("node").alias("u"), F.explode("ns").alias("v"))
        .where(F.col("u") < F.col("v"))
        .select("u", "v", F.lit(-edge_mark).cast("long").alias("w"))
    )
    cn = (
        wedges.unionByName(edge_rows)
        .groupBy("u", "v")
        .agg(F.sum("w").alias("cn"))
        .where(F.col("cn") > 0)
    )
    top = cn.orderBy(F.col("cn").desc(), "u", "v").limit(k)
    jac = F.col("cn").cast("double") / (
        F.col("du") + F.col("dv") - F.col("cn")
    ).cast("double")
    return (
        F.broadcast(top)
        .join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.col("u").alias("node_a"),
            F.col("v").alias("node_b"),
            F.col("cn").alias("common_neighbors"),
            jac.alias("jaccard"),
        )
        .orderBy(F.col("common_neighbors").desc(), "node_a", "node_b")
    )


def link_prediction_resource_allocation(
    edges: DataFrame,
    *,
    k: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    wedge_filter=None,
    scale: int = 9,
) -> DataFrame:
    """Top-``k`` missing links by the Resource-Allocation index
    (Zhou, Lü & Zhang, Eur. Phys. J. B 2009): ``RA(u,v) = Σ 1/deg(w)``
    over shared neighbors ``w`` — the hub-damped refinement of
    common-neighbor counting (a 2-degree shared neighbor is strong
    evidence, a 10^6-degree hub is none; Adamic-Adar's 1/log(deg)
    makes the same move, but log outputs are never engine-exact).

    Engine-exact trick (the pagerank scaled-long playbook): each
    wedge contributes the INTEGER ``10^scale DIV deg(w)`` and the
    score is the exact long sum — order-independent on any
    partitioning, bit-identical in any engine, and the ranking key is
    the long itself (the one double, ``ra_score = scaled / 10^scale``,
    is display only). Truncating division costs < 1 quantum per
    wedge; int64 headroom requires wedges-per-pair × 10^scale < 2^62
    (10^9 pairs-per-shared-neighbor at the default — the pagerank
    bound).

    Same physical shape as :func:`link_prediction_common_neighbors`
    minus the degree joins (the weight is the GENERATING node's
    degree, ``size(ns)`` of its own adjacency row — row-local): one
    cached adjacency aggregate, a two-level explode carrying the
    per-node weight, canonical-edge rows riding the same count
    shuffle with a ``-2^62`` sentinel (adjacent pairs sum negative
    and one filter drops them), TakeOrderedAndProject. ONE data
    shuffle after the adjacency build. ``wedge_filter`` bounds wedge
    generation exactly as in the common-neighbors operator.

    Returns (node_a, node_b, ra_score) with node_a < node_b, ranked
    (ra_scaled desc, node_a, node_b).
    """
    q = 10**scale
    sym = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("peer")
    ).unionByName(
        edges.select(F.col(dst_col).alias("node"), F.col(src_col).alias("peer"))
    ).where(F.col("node") != F.col("peer"))
    adj = (
        sym.groupBy("node")
        .agg(F.sort_array(F.collect_set("peer")).alias("ns"))
        .persist()
    )
    hubs = adj if wedge_filter is None else adj.where(wedge_filter)
    wedges = (
        hubs.select(
            F.posexplode("ns").alias("i", "u"),
            "ns",
            F.expr(f"CAST({q} AS BIGINT) DIV CAST(size(ns) AS BIGINT)").alias("w"),
        )
        .select(
            "u",
            F.explode(F.slice("ns", F.col("i") + 2, F.size("ns"))).alias("v"),
            "w",
        )
    )
    edge_rows = (
        adj.select(F.col("node").alias("u"), F.explode("ns").alias("v"))
        .where(F.col("u") < F.col("v"))
        .select("u", "v", F.lit(-(1 << 62)).cast("long").alias("w"))
    )
    ra = (
        wedges.unionByName(edge_rows)
        .groupBy("u", "v")
        .agg(F.sum("w").alias("ra_scaled"))
        .where(F.col("ra_scaled") > 0)
    )
    return (
        ra.orderBy(F.col("ra_scaled").desc(), "u", "v")
        .limit(k)
        .select(
            F.col("u").alias("node_a"),
            F.col("v").alias("node_b"),
            (F.col("ra_scaled").cast("double") / F.lit(float(q))).alias("ra_score"),
        )
    )


def label_propagation(
    edges: DataFrame,
    *,
    iterations: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007), the
    density-based community detector — distinct from connected
    components: CC merges everything reachable; LPA splits a connected
    graph into communities where labels win LOCAL majorities. The
    corpus-curation use is grouping domains/documents into topical
    neighborhoods cheaper than any clustering that needs embeddings.

    Deterministic fixed-iteration form (the pagerank playbook): labels
    start as node ids; each round every node adopts the most frequent
    label among its IN-neighbors over the DIRECTED edge list
    (symmetrize for undirected), ties broken by the minimum label, a
    node with no in-edges keeping its current label. Everything is
    exact integers and total-order tiebreaks, so a fixed ``iterations``
    run is bit-identical on any engine/partitioning. (Classic sync LPA
    caveats apply and are inherent, not bugs: bipartite structures can
    oscillate with period 2 — fixed iteration count makes the output
    well-defined regardless; the async/semi-sync variants that damp
    oscillation sacrifice engine-exact determinism.)

    Returns (node, label). Per round: one keyed join of labels onto
    edges, one map-side-combined (node, label) count, one per-node
    argmax window over the same node partitioning, one left join back
    to the node universe; rounds persist lazily and the walk stays one
    job for small ``iterations`` (each round is referenced by the next
    round AND the final output — the bfs_hops recompute-doubling
    lesson), switching to per-round localCheckpoint + unpersist beyond
    8 (the iterative-lineage rule). Pins up to ``iterations``
    |nodes|-sized cache entries in the lazy regime (pagerank contract).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    lazy = iterations <= 8
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    if not lazy:
        labels = labels.localCheckpoint(eager=True)
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label").asc())
    for _ in range(iterations):
        msgs = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pick = (
            msgs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        new_labels = (
            labels.join(pick, "node", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
        )
        if lazy:
            new_labels = new_labels.persist()
        else:
            new_labels = new_labels.localCheckpoint(eager=True)
            labels.unpersist()
        labels = new_labels
    if not lazy:
        nodes.unpersist()  # final labels are checkpointed; lineage is cut
    return labels


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 5,
    damping: tuple[int, int] = (85, 100),
    scale: int = 9,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank (Page et al. 1999) over a directed edge
    list, in INTEGER arithmetic end to end — the graph-quality signal a
    corpus pipeline ranks pages/domains with before sampling.

    Every quantity is an exact long: ranks are scaled by ``10^scale``
    (uniform init = one quantum-1 mass per node), each edge contributes
    ``r[src] DIV outdeg[src]``, and the damping update is the exact
    rational ``((den-num)·Q + num·Σcontrib) DIV den`` with
    ``(num, den) = damping`` — no float ever enters the recurrence, so
    the result is bit-identical on ANY engine/partitioning (the
    tokenize_bpe/scaled-long playbook applied to an iterative
    algorithm; floats appear once, in the final single divide for
    display). Truncating integer division leaks sub-quantum mass —
    that is the documented price of exactness, ~n·iterations quanta,
    i.e. < 1e-9 of total mass per node at the default scale. Nodes
    with no out-edges leak their damped mass (the classic "dangling"
    simplification); symmetrized graphs have none.

    Returns (node, rank) where rank = final scaled long / 10^scale
    (ranks average ~1.0 by construction, sum <= n).

    Shape at scale: the edge list is persisted once and every iteration
    is one shuffle — the contribution aggregate keyed on dst — plus a
    broadcast-or-keyed join of the (|nodes|-sized) rank frame onto the
    edges; ranks persist per iteration and the previous iteration
    unpersists, so lineage stays O(1) deep. The driver holds only the
    loop counter. int64 headroom: num·Σ <= num·n·Q, so the default
    (85, 100)/Q=1e9 is safe past 10^8 nodes; drop ``scale`` for more.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    num, den = damping
    if not (0 < num < den):
        raise ValueError(f"damping must be a proper fraction: {damping}")
    q = 10**scale

    # e itself is NOT persisted: nodes and ed (below) are, and they are
    # the only frames the loop re-reads — caching e too would pin a
    # redundant copy of the edge list with no unpersist handle
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "src").persist()  # (src, dst, deg) — reused every round

    ranks = nodes.select("node", F.lit(q).cast("long").alias("r")).persist()
    # the damping update stays in INTEGER division (Spark DIV == DuckDB
    # // on non-negatives); a double `/` + cast would round above 2^53
    update = F.expr(
        f"(CAST({(den - num) * q} AS BIGINT)"
        f" + {num} * coalesce(s, CAST(0 AS BIGINT))) DIV {den}"
    )
    for _ in range(iterations):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("r DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        new_ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select("node", update.alias("r"))
            .persist()
        )
        new_ranks.count()  # materialize before dropping the parent
        ranks.unpersist()
        ranks = new_ranks
    # the final ranks are already materialized, so the loop-only inputs
    # can be released; lineage recompute (if `out` is ever evicted)
    # falls back to the source scans
    nodes.unpersist()
    ed.unpersist()
    out = ranks.select(
        "node", (F.col("r").cast("double") / F.lit(float(q))).alias("rank")
    )
    # NOTE: the returned frame pins ONE |nodes|-sized cache entry (the
    # final `ranks` persist) for the application lifetime; callers that
    # need it released should materialize and unpersist via
    # out.sparkSession.catalog.clearCache() or track the frame themselves
    return out
