"""Deterministic sampling + sequence packing + decontamination semantics
(operators/sampling.py, operators/packing.py, dedup.decontaminate) —
invariants the SQL oracle can't express: determinism across calls,
complement partitioning, quota bounds, offset contiguity, planted
contamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_uniform_sample_deterministic_and_partitioning(spark, docs):
    from nibbledb_spark.operators.sampling import rate_threshold, sample_uniform

    total = docs.count()
    kept = sample_uniform(docs, 0.25)
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in sample_uniform(docs, 0.25).select("doc_id").collect())
    assert ids1 == ids2  # same sample on every run

    # complement predicate yields exactly the held-out set
    held = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
        >= rate_threshold(0.25)
    )
    assert kept.count() + held.count() == total

    # md5 prefixes are uniform: 25% +/- a generous binomial tolerance
    assert 0.15 <= len(ids1) / total <= 0.35

    # monotone: a larger rate strictly contains a smaller one
    ids50 = {r["doc_id"] for r in sample_uniform(docs, 0.5).select("doc_id").collect()}
    assert set(ids1) <= ids50


def test_rate_threshold_edges(spark, docs):
    from nibbledb_spark.operators.sampling import sample_uniform

    assert sample_uniform(docs, 1.0).count() == docs.count()
    assert sample_uniform(docs, 0.0).count() == 0
    with pytest.raises(ValueError):
        sample_uniform(docs, 1.5).count()


def test_stratified_rates_apply_per_stratum(spark, docs):
    from nibbledb_spark.operators.sampling import sample_stratified

    out = sample_stratified(
        docs, {"src1": 1.0}, stratum_col="source", default_rate=0.0
    )
    # rate-1.0 stratum keeps every row, rate-0 default keeps none
    assert out.count() == docs.where(F.col("source") == "src1").count()
    assert out.where(F.col("source") != "src1").count() == 0


def test_exact_k_and_quota(spark, docs):
    from nibbledb_spark.operators.sampling import (
        sample_exact_k,
        sample_quota_per_group,
    )

    assert sample_exact_k(docs, 7).count() == 7
    # deterministic: same 7 ids
    a = {r["doc_id"] for r in sample_exact_k(docs, 7).collect()}
    b = {r["doc_id"] for r in sample_exact_k(docs, 7).collect()}
    assert a == b

    quota = sample_quota_per_group(docs, 3, group_col="source")
    per = quota.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in per)
    # groups with >= 3 docs hit the quota exactly
    big = {
        r["source"]
        for r in docs.groupBy("source").count().where("count >= 3").collect()
    }
    got = {r["source"]: r["count"] for r in per}
    assert all(got[s] == 3 for s in big)


def test_pack_sequences_offsets_contiguous(spark, docs):
    from nibbledb_spark.operators.packing import pack_sequences

    out = pack_sequences(docs, 512).collect()
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rows:
            assert r["start_offset"] == offset  # exclusive prefix sum
            assert r["pack_id"] == offset // 512
            ends_in = (offset + r["n_tokens"] - 1) // 512
            assert r["straddles"] == (ends_in != r["pack_id"])
            offset += r["n_tokens"]


def test_decontaminate_planted_overlap(spark):
    from nibbledb_spark.operators.dedup import decontaminate

    phrase = "one two three four five six seven"  # 7 tokens -> 5 trigrams
    train = spark.createDataFrame(
        [
            (100, f"completely unrelated filler text here {phrase}"),
            (101, "nothing shared with the eval set at all today"),
        ],
        "doc_id int, text string",
    )
    eval_set = spark.createDataFrame(
        [(1, f"{phrase} and some eval only suffix words")],
        "doc_id int, text string",
    )
    out = decontaminate(train, eval_set, min_overlap=3).collect()
    assert [(r["train_id"], r["eval_id"]) for r in out] == [(100, 1)]
    # the 5 trigrams fully inside the shared phrase are counted; boundary
    # trigrams differ between the two contexts
    assert out[0]["n_shared"] == 5


def test_prep_training_mix_composes_stages(spark, docs):
    """The composed plan must equal running the three stages by hand."""
    from nibbledb_spark.operators.packing import pack_sequences
    from nibbledb_spark.operators.pipeline import clean_corpus, prep_training_mix
    from nibbledb_spark.operators.sampling import sample_stratified

    mix = prep_training_mix(docs, rates={"src1": 1.0}, default_rate=0.25)
    surv = clean_corpus(docs)
    kept = docs.join(surv, "doc_id", "left_semi")
    sampled = sample_stratified(kept, {"src1": 1.0}, default_rate=0.25)
    manual = pack_sequences(sampled, 512)
    got = sorted(tuple(r) for r in mix.collect())
    want = sorted(tuple(r) for r in manual.collect())
    assert got == want and len(got) > 0


def test_token_budget_fills_each_group_minimally(spark):
    """Each source reaches the token budget (the crossing doc is
    included) and no kept doc is superfluous (dropping the last one
    would leave the group under budget) — per-group minimal cover in
    deterministic hash order."""
    from nibbledb_spark.operators.sampling import sample_token_budget_per_group
    from nibbledb_spark.queries import _t

    B = 600
    docs = _t(spark, SF, "documents")
    kept = sample_token_budget_per_group(docs, B).collect()
    totals: dict[str, int] = {}
    for r in kept:
        totals[r["source"]] = totals.get(r["source"], 0) + r["n_tokens"]
    n_sources = docs.select("source").distinct().count()
    assert len(totals) == n_sources
    # crossing doc included -> at/above budget (when the group has enough)
    per_source_total = {
        r["source"]: r["t"]
        for r in docs.selectExpr("source", "size(split(text, '\\\\s+')) AS nt")
        .groupBy("source").sum("nt").withColumnRenamed("sum(nt)", "t").collect()
    }
    for src, tot in totals.items():
        assert tot >= min(B, per_source_total[src])
    # minimality: exclusive prefix of the last kept doc is under budget,
    # equivalent to total - its tokens < B for every group
    from collections import defaultdict
    by_src = defaultdict(list)
    for r in kept:
        by_src[r["source"]].append(r)
    for src, rows in by_src.items():
        smallest_needed = min(totals[src] - r["n_tokens"] for r in rows)
        # at least one kept doc (the crossing one) satisfies prior < B
        assert smallest_needed < B


def test_training_shards_partition_and_balance(spark, docs):
    """Shard assignment is a deterministic partition of the corpus:
    every doc gets exactly one stable shard, totals are preserved, and
    hash balance keeps every shard within 3x of the mean (500 docs over
    8 shards is small; the bound is loose by design)."""
    from nibbledb_spark.operators.pipeline import (
        assign_training_shards,
        shard_manifest,
    )

    sharded = assign_training_shards(docs, 8)
    again = assign_training_shards(docs, 8)
    a = {(r["doc_id"], r["shard"]) for r in sharded.select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"]) for r in again.select("doc_id", "shard").collect()}
    assert a == b and len(a) == docs.count()
    man = shard_manifest(sharded).collect()
    assert sorted(r["shard"] for r in man) == list(range(8))
    assert sum(r["n_docs"] for r in man) == docs.count()
    mean = docs.count() / 8
    assert all(r["n_docs"] < 3 * mean for r in man)


def test_weighted_priority_sample_deterministic_and_weighted(spark, docs):
    """A-ES weighted sampling: exact k, identical selection on any
    partitioning, and higher-weight strata are selected at a higher
    rate (the per-row inclusion odds scale with the weight)."""
    from nibbledb_spark.operators.sampling import weighted_priority_sample

    weights = {"src0": 4, "src1": 4, "src2": 2, "src3": 2}
    s1 = weighted_priority_sample(docs, 100, weights)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    s2 = weighted_priority_sample(docs.repartition(13), 100, weights)
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2 and len(ids1) == 100

    by_src = {
        r["source"]: r["n"]
        for r in s1.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_docs = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    rate4 = sum(by_src.get(s, 0) for s in ("src0", "src1")) / sum(
        n_docs[s] for s in ("src0", "src1")
    )
    rate1 = sum(
        by_src.get(s, 0) for s in n_docs if s not in weights
    ) / sum(n for s, n in n_docs.items() if s not in weights)
    assert rate4 > 2 * rate1  # 4x odds dominate the 1x baseline

    with pytest.raises(ValueError):
        weighted_priority_sample(docs, 0, weights)
    with pytest.raises(ValueError):
        weighted_priority_sample(docs, 5, {"src0": -1})
    with pytest.raises(ValueError, match="lcm"):
        # coprime weights would need a 9797-multiplication chain
        weighted_priority_sample(docs, 5, {"src0": 97, "src1": 101})


def test_split_assign_disjoint_exhaustive_stable(spark, docs):
    """Every doc gets exactly one split; fractions land near target;
    assignment is append-stable (a doc's split never changes when the
    corpus grows) and complement-consistent with sample_uniform's hash
    intervals."""
    from nibbledb_spark.operators.sampling import split_assign

    total = docs.count()
    out = split_assign(docs)
    assert out.count() == total  # exhaustive, one row per doc
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) <= {"train", "val", "test"}
    assert 0.7 <= counts["train"] / total <= 0.9
    # append-stability: the same docs in a half-corpus get the SAME split
    half = split_assign(docs.where("doc_id % 2 = 0"))
    full_map = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in half.collect():
        assert full_map[r["doc_id"]] == r["split"]
    # custom fractions + validation
    two = split_assign(docs, {"a": 0.5, "b": 0.5})
    assert set(r["split"] for r in two.select("split").distinct().collect()) == {
        "a",
        "b",
    }
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, {"a": 0.5, "b": 0.2})
    with pytest.raises(ValueError, match="non-negative"):
        split_assign(docs, {"a": 1.5, "b": -0.5})


def test_temperature_mix_flattens_toward_low_resource(spark):
    """alpha = 0.5 tempering: mix shares sum to 1, low-resource sources
    get a HIGHER share than their raw frequency (and high-resource
    lower), keep rates cap at 1, and the realized selection tracks the
    tempered rates."""
    from nibbledb_spark.operators.sampling import (
        sample_temperature_mix,
        temperature_mix_rates,
    )

    # 10:1 imbalance: raw shares 10/11 vs 1/11; sqrt-tempered shares
    # sqrt(10):sqrt(1) ~ 0.76 vs 0.24
    rows = [(i, "big") for i in range(1000)] + [
        (10_000 + i, "small") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {
        r["source"]: r for r in temperature_mix_rates(docs, budget_frac=0.5).collect()
    }
    assert abs(sum(r["mix_share"] for r in rates.values()) - 1.0) < 1e-9
    assert rates["small"]["mix_share"] > 100 / 1100  # flattened UP
    assert rates["big"]["mix_share"] < 1000 / 1100  # flattened DOWN
    assert all(r["keep_rate"] <= 1.0 for r in rates.values())
    # the small source keeps a larger FRACTION of itself than the big one
    sel = sample_temperature_mix(docs, budget_frac=0.5)
    by = {
        r["source"]: r["n"]
        for r in sel.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by["small"] / 100 > by["big"] / 1000
    # deterministic membership
    ids1 = sorted(r["doc_id"] for r in sel.collect())
    ids2 = sorted(
        r["doc_id"] for r in sample_temperature_mix(docs, budget_frac=0.5).collect()
    )
    assert ids1 == ids2
    with pytest.raises(ValueError, match="budget_frac"):
        temperature_mix_rates(docs, budget_frac=0.0)
    with pytest.raises(ValueError, match="engine-exact"):
        temperature_mix_rates(docs, alpha_sqrt=False)


def test_linear_score_paths_agree(spark, docs):
    """The zero-shuffle fold path and the broadcast-join trained-model
    path produce IDENTICAL scores (same oracle in the registry), custom
    weights actually change scores, and zero-token docs emit
    (0, 0, NULL) on both paths."""
    from nibbledb_spark.operators.text import (
        LINEAR_SCORE_FEATURES,
        demo_weight,
        linear_quality_score,
    )

    demo_tbl = spark.range(LINEAR_SCORE_FEATURES).select(
        F.col("id").alias("feature"),
        demo_weight(F.col("id")).cast("long").alias("weight"),
    )
    a = {
        r["id"]: (r["n_toks"], r["dot_scaled"], r["lin_score"])
        for r in linear_quality_score(docs).collect()
    }
    b = {
        r["id"]: (r["n_toks"], r["dot_scaled"], r["lin_score"])
        for r in linear_quality_score(docs, demo_tbl).collect()
    }
    assert a == b and len(a) == docs.count()
    # a different weight vector changes scores (the join is real)
    zero_tbl = demo_tbl.withColumn("weight", F.lit(0).cast("long"))
    z = linear_quality_score(docs, zero_tbl)
    assert z.where("dot_scaled <> 0").count() == 0
    # zero-token doc: (0, 0, NULL) on both paths
    empty = spark.createDataFrame([(1, ""), (2, "x y")], "doc_id long, text string")
    for wtab in (None, demo_tbl):
        got = {
            r["id"]: (r["n_toks"], r["dot_scaled"], r["lin_score"])
            for r in linear_quality_score(empty, wtab).collect()
        }
        # splitting "" on \s+ yields [""]; the empty token is filtered
        assert got[1][0] == 0 and got[1][1] == 0 and got[1][2] is None
        assert got[2][0] == 2


def test_shuffle_deterministic_permutation_and_invariance(spark, docs):
    """pos is a permutation of 0..n-1, equals the global
    (md5(salt:key), key) sort order, survives any input partitioning,
    and a new salt is a genuinely different permutation."""
    from nibbledb_spark.operators.sampling import shuffle_deterministic

    out = shuffle_deterministic(docs, key_col="doc_id", salt="e0")
    rows = out.select("doc_id", "pos").collect()
    n = docs.count()
    assert sorted(r["pos"] for r in rows) == list(range(n))
    # ground truth: the undecomposed global order
    import hashlib

    want = sorted(
        (hashlib.md5(f"e0:{r['doc_id']}".encode()).hexdigest(), r["doc_id"])
        for r in docs.select("doc_id").collect()
    )
    want_pos = {doc_id: i for i, (_, doc_id) in enumerate(want)}
    assert {r["doc_id"]: r["pos"] for r in rows} == want_pos
    # partitioning invariance: same positions from any physical layout
    re7 = shuffle_deterministic(
        docs.repartition(7), key_col="doc_id", salt="e0"
    )
    assert {r["doc_id"]: r["pos"] for r in re7.select("doc_id", "pos").collect()} == want_pos
    # a different salt reorders (the per-epoch reshuffle)
    e1 = shuffle_deterministic(docs, key_col="doc_id", salt="e1")
    pos1 = {r["doc_id"]: r["pos"] for r in e1.select("doc_id", "pos").collect()}
    assert pos1 != want_pos
    assert sorted(pos1.values()) == list(range(n))
    with pytest.raises(ValueError, match="prefix_len"):
        shuffle_deterministic(docs, prefix_len=0)


def test_shuffle_deterministic_prefix8_no_row_loss(spark, docs):
    """prefix_len=8 buckets reach 0xFFFFFFFF > INT_MAX (round-10
    self-review): a 32-bit bucket cast NULLs the top half of the hash
    space and the inner offset join then silently drops those rows —
    pos must stay a full permutation at the maximum allowed width."""
    from nibbledb_spark.operators.sampling import shuffle_deterministic

    out = shuffle_deterministic(docs, key_col="doc_id", prefix_len=8)
    n = docs.count()
    assert sorted(r["pos"] for r in out.select("pos").collect()) == list(
        range(n)
    )


def test_shuffle_deterministic_no_global_sort(spark, docs):
    """The corpus never funnels through one partition: the only global
    (single-partition) window in the plan runs over the tiny per-bucket
    count frame, and the corpus-side window partitions by bucket."""
    from nibbledb_spark.operators.sampling import shuffle_deterministic

    plan = shuffle_deterministic(docs, key_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    # corpus rows are never globally sorted: no Sort with a global
    # Exchange SinglePartition feeding a row_number over the full data.
    # The SinglePartition exchange that IS present belongs to the
    # 16^prefix_len-row counts frame (look for it beneath an aggregate).
    import re as _re

    singles = plan.count("SinglePartition")
    assert singles <= 2, plan  # offsets window (+AQE echo), never the corpus


def _ffd_reference(sizes, budget):
    """Textbook FFD over (n, id) pairs — the independent model the Spark
    operator must reproduce exactly (same sort key, same first-fit)."""
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i][0], sizes[i][1]))
    free, fill, place = [], [], {}
    for i in order:
        n, _id = sizes[i]
        if n > 64:
            place[_id] = (len(free), 0, True)
            free.append(0)
            fill.append(n)
            continue
        for b, f in enumerate(free):
            if f >= n:
                break
        else:
            b = len(free)
            free.append(64)
            fill.append(0)
        place[_id] = (b, fill[b], False)
        free[b] -= n
        fill[b] += n
    return place


def test_pack_bins_ffd_matches_reference_model(spark, docs):
    """The distributed FFD equals the sequential textbook FFD bin-for-bin
    (same (len desc, id) order, same first-fit choice, same offsets,
    same oversize handling) on every source group of the real corpus."""
    from pyspark.sql import functions as F

    from nibbledb_spark.operators.packing import pack_bins_ffd
    from nibbledb_spark.operators.text import tokens

    out = pack_bins_ffd(docs, 64).collect()
    sizes = {
        (r["doc_id"], r["source"]): r["n"]
        for r in docs.select(
            "doc_id", "source", F.size(tokens("text")).alias("n")
        ).collect()
    }
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["group"], []).append(r)
        assert r["n_tokens"] == sizes[(r["doc_id"], r["group"])]
    assert sum(len(v) for v in by_group.values()) == len(sizes)
    for g, rows in by_group.items():
        model = _ffd_reference(
            [(r["n_tokens"], r["doc_id"]) for r in rows], 64
        )
        for r in rows:
            assert (r["bin_id"], r["bin_offset"], r["oversize"]) == model[
                r["doc_id"]
            ], (g, r["doc_id"])

    # determinism across runs
    again = pack_bins_ffd(docs, 64).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pack_bins_ffd_invariants_and_subgroups(spark):
    """Cap respected, at most one bin at/below half fill per group
    (first-fit guarantee), offsets contiguous, oversize docs isolated —
    and all of it still holds with hash subgrouping (the big-group scale
    path), where each subgroup is an independent stream."""
    import pytest as _pytest

    from nibbledb_spark.operators.packing import pack_bins_ffd

    rows = [
        (i, "s", " ".join(["w"] * n))
        for i, n in enumerate([40, 40, 30, 30, 20, 10, 9, 70, 100, 3, 3])
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    for n_sub in (1, 3):
        out = pack_bins_ffd(docs, 64, n_subgroups=n_sub).collect()
        assert len(out) == len(rows)
        bins: dict[tuple, list] = {}
        for r in out:
            bins.setdefault((r["group"], r["bin_id"]), []).append(r)
        for members in bins.values():
            fills = sorted(r["bin_offset"] for r in members)
            total = sum(r["n_tokens"] for r in members)
            if any(r["oversize"] for r in members):
                assert len(members) == 1  # oversize docs never share
                assert members[0]["n_tokens"] > 64
            else:
                assert total <= 64
            # contiguous placement: offsets are the running fill
            run = 0
            for r in sorted(members, key=lambda r: r["bin_offset"]):
                assert r["bin_offset"] == run
                run += r["n_tokens"]
            assert fills[0] == 0
        # first-fit guarantee: <=1 non-oversize bin at or below half fill
        by_group: dict[str, list] = {}
        for (g, b), members in bins.items():
            fill = sum(r["n_tokens"] for r in members)
            if not any(r["oversize"] for r in members):
                by_group.setdefault(g, []).append(fill)
        for g, fills in by_group.items():
            assert sum(1 for f in fills if 2 * f <= 64) <= 1, (g, fills)
    with _pytest.raises(ValueError, match="budget"):
        pack_bins_ffd(docs, 0)
    with _pytest.raises(ValueError, match="n_subgroups"):
        pack_bins_ffd(docs, 64, n_subgroups=0)


def test_dsir_weights_shift_mixture_toward_target(spark):
    """DSIR pin on a skewed synthetic corpus: pool docs written in the
    target's vocabulary outweigh off-target docs (every one of them),
    and resampling the pool by weight shifts the selected mixture
    toward the target-like share. Also pins weight ~ 1 symmetry when
    pool == target distribution."""
    from nibbledb_spark.operators.sampling import dsir_hashed_ngram_weights

    a_text = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    b_text = "omega psi chi phi omega psi chi phi omega psi"
    target = spark.createDataFrame(
        [(1000 + i, a_text) for i in range(20)], "doc_id long, text string"
    )
    # pool: 10 target-like docs, 30 off-target docs
    pool = spark.createDataFrame(
        [(i, a_text) for i in range(10)]
        + [(100 + i, b_text) for i in range(30)],
        "doc_id long, text string",
    )
    w = dsir_hashed_ngram_weights(pool, target).collect()
    assert len(w) == 40
    wa = [r["weight"] for r in w if r["doc_id"] < 100]
    wb = [r["weight"] for r in w if r["doc_id"] >= 100]
    assert min(wa) > max(wb)  # every target-like doc outweighs every off-target doc
    # resample: top-10 by (weight desc, id) — mixture shifts 25% -> 100%
    top = sorted(w, key=lambda r: (-r["weight"], r["doc_id"]))[:10]
    share_before = 10 / 40
    share_after = sum(1 for r in top if r["doc_id"] < 100) / 10
    assert share_after > share_before
    assert share_after == 1.0
    # identical distributions => every ratio ~1 (exact up to smoothing
    # mass and the DIV quantization): weights within a tight band of 1
    same = dsir_hashed_ngram_weights(target, target).collect()
    for r in same:
        assert 0.9 < r["weight"] < 1.1, r


def test_bernoulli_importance_resample_semantics(spark):
    """Bernoulli acceptance pins: weight >= kappa always survives,
    weight 0 never does, and the kept set equals the exact md5-uniform
    replay (u·kappa < weight per doc) — deterministic across runs and
    partitionings; kappa guard raises."""
    import hashlib

    import pytest

    from nibbledb_spark.operators.sampling import bernoulli_importance_resample

    rows = [(i, [2.5, 0.0, 1.0, 0.4, 1.9][i % 5]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, weight double")
    kept = {r["doc_id"] for r in bernoulli_importance_resample(df).collect()}

    def u(i):
        return (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) + 1) / float(
            1 << 52
        )

    exp = {i for i, w in rows if u(i) * 2.0 < w}
    assert kept == exp
    assert all(i in kept for i, w in rows if w >= 2.5)  # >= kappa: certain
    assert all(i not in kept for i, w in rows if w == 0.0)
    # fates are per-key stable: a repartitioned run keeps the same set
    kept2 = {
        r["doc_id"]
        for r in bernoulli_importance_resample(df.repartition(7)).collect()
    }
    assert kept2 == kept

    with pytest.raises(ValueError, match="kappa"):
        bernoulli_importance_resample(df, kappa=0)
