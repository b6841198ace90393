"""Property-based invariants (hypothesis) over random point sets —
SURVEY.md §5 test plan item 4.

Each example ingests a random batch through the engine and checks the
reference's observable semantics hold regardless of data shape:
lengths, selection algebra, ordering, delete, filter algebra, and
compaction invariance. Examples are kept small and few: every example
is a real Spark write + several collects."""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nibbledb_spark.engine import TimeSeriesEngine

TS0 = 1_439_856_000_000_000

points_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # ts offset (collisions likely)
        st.sampled_from([None, {"loc": "1"}, {"loc": "2"}, {"loc": "1", "sci": "x"}]),
        st.integers(min_value=-5, max_value=5),  # value
    ),
    min_size=1,
    max_size=25,
)


def _mk_engine(spark, rows):
    eng = TimeSeriesEngine(spark, tempfile.mkdtemp(prefix="prop_"), num_buckets=4)
    recs = [
        {"timestamp": TS0 + dt, "value": float(v), **({"tag": tag} if tag else {})}
        for (dt, tag, v) in rows
    ]
    eng.write("s", recs)
    return eng


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
@given(raw=edges_strategy)
def test_graph_family_invariants_random_graphs(spark, raw):
    """Graph-operator invariants on random ≤10-node graphs, each checked
    against a sequential Python oracle: triangle counts equal the
    brute-force enumeration; bounded BFS distances equal BFS from the
    min node; LPA round-3 labels equal the replayed recurrence; the
    k-core(2) node set equals iterated peeling; and triangle counts are
    invariant under edge duplication + reversal (canonicalization)."""
    import itertools

    from nibbledb_spark.operators.graph import (
        bfs_hops,
        kcore,
        label_propagation,
        triangle_count,
    )

    eset = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not eset:
        return
    edges = sorted(eset)
    nodes = sorted({v for e in edges for v in e})
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src long, dst long")

    # triangles vs brute force, + canonicalization invariance
    brute = {v: 0 for v in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            brute[a] += 1
            brute[b] += 1
            brute[c] += 1
    got = {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}
    assert got == brute
    messy = spark.createDataFrame(
        sym + edges + [(v, v) for v in nodes[:2]], "src long, dst long"
    )
    assert {r["node"]: r["n_tri"] for r in triangle_count(messy).collect()} == brute

    # bounded BFS vs python BFS from the min node
    seed = nodes[0]
    adj: dict = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    dist = {seed: 0}
    frontier = [seed]
    for d in range(1, 4):
        nxt = []
        for u in frontier:
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        frontier = nxt
    seeds = spark.createDataFrame([(seed,)], "node long")
    got_d = {r["node"]: r["hops"] for r in bfs_hops(df, seeds, 3).collect()}
    assert got_d == dist

    # LPA vs sequential replay (3 rounds)
    lab = {n: n for n in nodes}
    for _ in range(3):
        cnt: dict = {}
        for a, b in sym:
            cnt.setdefault(b, {}).setdefault(lab[a], 0)
            cnt[b][lab[a]] += 1
        lab = {
            n: (
                min(l for l, c in cnt[n].items() if c == max(cnt[n].values()))
                if n in cnt
                else lab[n]
            )
            for n in nodes
        }
    got_l = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=3).collect()
    }
    assert got_l == lab

    # k-core(2) vs iterated peel to fixpoint (10 rounds >= any 10-node peel)
    cur = set(edges)
    for _ in range(10):
        deg: dict = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= 2}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    exp_core = {}
    for a, b in cur:
        exp_core[a] = exp_core.get(a, 0) + 1
        exp_core[b] = exp_core.get(b, 0) + 1
    exp_core = {n: d for n, d in exp_core.items() if d >= 2}
    got_k = {
        r["node"]: r["degree"] for r in kcore(df, 2, rounds=10).collect()
    }
    assert got_k == exp_core

    # link prediction (CN + RA) vs brute force over ALL non-edges
    # (k=100 > C(10,2), so top-k is the complete scored set)
    from nibbledb_spark.operators.graph import (
        link_prediction_common_neighbors,
        link_prediction_resource_allocation,
    )

    exp_cn, exp_ra = {}, {}
    for u, v in itertools.combinations(nodes, 2):
        if (u, v) in eset:
            continue
        shared = adj.get(u, set()) & adj.get(v, set())
        if not shared:
            continue
        cn = len(shared)
        exp_cn[(u, v)] = (
            cn,
            cn / (len(adj[u]) + len(adj[v]) - cn),
        )
        exp_ra[(u, v)] = sum(10**9 // len(adj[w]) for w in shared) / 1e9
    got_cn = {
        (r["node_a"], r["node_b"]): (r["common_neighbors"], r["jaccard"])
        for r in link_prediction_common_neighbors(df, k=100).collect()
    }
    assert got_cn == exp_cn
    got_ra = {
        (r["node_a"], r["node_b"]): r["ra_score"]
        for r in link_prediction_resource_allocation(df, k=100).collect()
    }
    assert got_ra == exp_ra


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(rows=points_strategy)
def test_selection_and_ordering_invariants(spark, rows):
    eng = _mk_engine(spark, rows)
    n_total = len(rows)

    # A27: length == ingested count (no dedup anywhere, quirk Q6)
    assert eng.length(["s"]) == n_total

    # A6/A34: last(n) = the n newest, sorted desc; multiset equality
    # against a Python oracle (same-ts order is canonicalized, Q5)
    all_ts = sorted((TS0 + dt for (dt, _, _) in rows), reverse=True)
    for n in (1, 3, n_total + 5):
        got = [r["ts"] for r in eng.last(["s"], n).collect()]
        assert got == all_ts[:n]
        assert got == sorted(got, reverse=True)

    # A8: first(n) symmetric
    got_first = [r["ts"] for r in eng.first(["s"], 2).collect()]
    assert got_first == sorted(all_ts)[:2]

    # A10/A11: since/range selection algebra, bounds inclusive
    mid = TS0 + 10
    since_rows = eng.since(["s"], mid).collect()
    assert [r["ts"] for r in since_rows] == [t for t in all_ts if t >= mid]
    lo, hi = TS0 + 3, TS0 + 15
    rng = eng.range(["s"], lo, hi).collect()
    assert sorted(r["ts"] for r in rng) == sorted(t for t in all_ts if lo <= t <= hi)

    # union consistency: range(min, max) returns everything
    assert eng.range(["s"], min(all_ts), max(all_ts)).count() == n_total


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(rows=points_strategy, cut=st.integers(min_value=0, max_value=20))
def test_aggregate_filter_delete_compact_invariants(spark, rows, cut):
    eng = _mk_engine(spark, rows)
    vals = [float(v) for (_, _, v) in rows]

    # A16/A17: sum/count against the Python oracle (ints — exact)
    assert eng.aggregate(["s"], "sum") == {"sum": float(sum(vals))}
    assert eng.aggregate(["s"], "count") == {"count": float(len(vals))}
    assert eng.aggregate(["s"], "max") == {"max": max(vals)}

    # A13: tag filter equals == Python predicate on the same rows
    from nibbledb_spark.operators import timeseries as ts_ops

    expect = sorted(
        (TS0 + dt, float(v)) for (dt, tag, v) in rows if tag and tag.get("loc") == "1"
    )
    got = sorted(
        (r["ts"], r["value"])
        for r in ts_ops.tag_filter(eng.points(["s"]), ["loc"], ["1"]).collect()
    )
    assert got == expect

    # A4 analogue: compaction never changes query results
    before = sorted((r["ts"], r["value"]) for r in eng.points(["s"]).collect())
    eng.compact()
    after = sorted((r["ts"], r["value"]) for r in eng.points(["s"]).collect())
    assert before == after

    # A25: delete since(cut) removes exactly ts >= cut
    eng.delete(["s"], TS0 + cut)
    remaining = sorted(r["ts"] for r in eng.points(["s"]).collect())
    assert remaining == sorted(TS0 + dt for (dt, _, _) in rows if TS0 + dt < TS0 + cut)
    # idempotent
    eng.delete(["s"], TS0 + cut)
    assert eng.length(["s"]) == len(remaining)


@settings(max_examples=50, deadline=None)
@given(
    record=st.fixed_dictionaries(
        {},
        optional={
            "timestamp": st.one_of(st.integers(min_value=0, max_value=2**52), st.text(max_size=3)),
            "tag": st.one_of(
                st.none(),
                st.lists(st.dictionaries(st.text(max_size=3), st.text(max_size=3), max_size=2), max_size=3),
                st.dictionaries(st.text(max_size=3), st.text(max_size=3), max_size=2),
                st.integers(),
            ),
            "value": st.one_of(st.floats(allow_nan=False, allow_infinity=False), st.integers(), st.text(max_size=3)),
            "junk": st.integers(),
        },
    )
)
def test_wire_validation_total(record):
    """validate_point either returns a canonical (ts, tag, value) triple
    or raises ValidationError — never any other exception, in both
    modes (pure driver-side check, no Spark)."""
    from nibbledb_spark.schema import ValidationError, validate_point

    for strict in (False, True):
        try:
            ts, tag, value = validate_point(record, strict=strict)
        except ValidationError:
            continue
        assert isinstance(ts, int)
        assert tag is None or isinstance(tag, dict)
        assert isinstance(value, float)


# ---------------------------------------------------------------------------
# connected components vs a union-find oracle
# ---------------------------------------------------------------------------

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=40,
)


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # canonical label = min node of each set
    roots: dict[int, int] = {}
    for n in list(parent):
        r = find(n)
        roots[r] = min(roots.get(r, n), n)
    return {n: roots[find(n)] for n in parent}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed hash-min labeling agrees with a sequential union-find
    on arbitrary random graphs (self-loops, duplicates, multi-component,
    any diameter up to the node bound)."""
    from nibbledb_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "src", "dst", max_iter=35).collect()
    }
    want = _union_find_components(edges)
    # pure self-loop nodes appear in the oracle but carry no real edge;
    # the operator filters node != peer, so drop them from both sides
    # unless they also touch a real edge
    real = {n for a, b in edges if a != b for n in (a, b)}
    assert {k: v for k, v in got.items() if k in real} == {
        k: v for k, v in want.items() if k in real
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(edges=edges_strategy)
def test_star_components_match_union_find(spark, edges):
    """The O(log n) large-star/small-star variant must agree with the
    union-find oracle (and therefore with hash-min) on random graphs."""
    from nibbledb_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(df, "src", "dst").collect()
    }
    want = _union_find_components(edges)
    real = {n for a, b in edges if a != b for n in (a, b)}
    assert {k: v for k, v in got.items() if k in real} == {
        k: v for k, v in want.items() if k in real
    }


# ---------------------------------------------------------------------------
# JPEG codec property: random smooth images round-trip within the
# DCT-rounding tolerance across sizes, subsampling, and restart settings
# (pure-Python check — no Spark work per example, so examples are cheap)
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    h8=st.integers(min_value=1, max_value=3),
    w8=st.integers(min_value=1, max_value=3),
    oh=st.integers(min_value=0, max_value=7),
    ow=st.integers(min_value=0, max_value=7),
    seed=st.integers(min_value=0, max_value=2**31),
    subsample=st.booleans(),
    ri=st.sampled_from([0, 1, 3]),
)
def test_jpeg_round_trip_property(h8, w8, oh, ow, seed, subsample, ri):
    """decode(encode(img)) stays within a few counts of img for smooth
    content at ANY size (including non-multiple-of-8 edges, where the
    codec pads and crops), with and without 4:2:0 subsampling and
    restart intervals. Gray-valued RGB keeps chroma constant, so 4:2:0
    averaging is lossless and the tolerance stays the DCT-rounding one."""
    import numpy as np

    from nibbledb_spark.operators.multimodal import decode_image
    from test_extensions import _jpeg_bytes

    from test_extensions import _jpeg_progressive_bytes

    rng = np.random.default_rng(seed)
    h, w = h8 * 8 + oh, w8 * 8 + ow
    # smooth luminance: coarse 8x-upsampled noise (low frequency)
    base = rng.integers(30, 226, size=(-(-h // 8), -(-w // 8), 1))
    lum = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:h, :w]
    rgb = np.repeat(lum, 3, axis=2).astype(np.uint8)
    got = decode_image(_jpeg_bytes(rgb, subsample=subsample, restart_interval=ri))
    assert got.shape == rgb.shape
    err = np.abs(got.astype(int) - rgb.astype(int)).max()
    assert err <= 4, (h, w, subsample, ri, err)
    if not subsample:
        # progressive (4:4:4 only) must match the sequential decode of
        # the same coefficients EXACTLY, at every size and restart pitch
        seq = decode_image(_jpeg_bytes(rgb))
        prog = decode_image(_jpeg_progressive_bytes(rgb, restart_interval=ri))
        assert np.array_equal(prog, seq), (h, w, ri)


# --- exact-substring span family: planted-span recovery ----------------

span_params = st.tuples(
    st.integers(min_value=15, max_value=40),   # planted span length
    st.integers(min_value=0, max_value=30),    # doc-1 prefix length
    st.integers(min_value=0, max_value=30),    # doc-2 prefix length
    st.integers(min_value=0, max_value=20),    # doc-1 suffix length
    st.integers(min_value=0, max_value=20),    # doc-2 suffix length
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(params=span_params)
def test_substring_span_planted_recovery(spark, params):
    """Property: a span of L >= 15 globally-unique tokens planted in two
    documents whose other tokens are document-unique is recovered as
    EXACTLY one maximal span with exact offsets and length — no
    over-merge, no truncation, no phantom pairs — and scrub removes
    exactly the later copy."""
    from nibbledb_spark.operators.dedup import (
        substring_dup_spans,
        substring_scrub,
    )

    span_len, p1, p2, s1_len, s2_len = params
    shared = [f"sh{i}" for i in range(span_len)]
    d1 = [f"a{i}" for i in range(p1)] + shared + [f"z{i}" for i in range(s1_len)]
    d2 = [f"b{i}" for i in range(p2)] + shared + [f"y{i}" for i in range(s2_len)]
    docs = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2))], "doc_id long, text string"
    )
    spans = substring_dup_spans(docs, min_tokens=15).collect()
    assert len(spans) == 1
    s = spans[0]
    assert (s["doc_id1"], s["doc_id2"]) == (1, 2)
    assert (s["start1"], s["start2"]) == (p1 + 1, p2 + 1)  # 1-based
    assert s["len_tokens"] == span_len
    out = {r["doc_id"]: r for r in substring_scrub(docs, min_tokens=15).collect()}
    assert out[1]["removed_tokens"] == 0
    assert out[1]["text"] == " ".join(d1)
    assert out[2]["removed_tokens"] == span_len
    assert out[2]["text"] == " ".join(
        [f"b{i}" for i in range(p2)] + [f"y{i}" for i in range(s2_len)]
    )
