"""Regenerate the driver-verification rotation list in __spark_entry__.py.

The driver's correctness harness runs exactly the first 50 registry
entries per round; ``__spark_entry__.queries()`` sorts already-verified
names to the back so the cross-round union covers the whole registry.
Run this at the START of each round with every CORRECTNESS_r*.json
present:

    python tools/update_rotation.py CORRECTNESS_r*.json

A query counts as driver-verified ONLY when its record shows hash_match
true. APPROX rows-only entries (err == "no_oracle") are NOT counted —
they were never hash-matched (round-3 advice); ``__spark_entry__``
sorts them structurally last instead, since re-running them can only
ever log another ``no_oracle``. Names no longer in the registry are
dropped silently.

The emitted verified list is ordered by STALENESS: names whose most
recent hash-match is oldest sort first (tie-break: registry order), so
the driver's 50-slot budget always re-checks the sentinels that have
gone longest without verification. With the whole registry verified,
this converges to a round-robin — every name is re-checked every
ceil(registry/50) rounds — and a regression in any verified query is
re-caught within that window rather than hidden forever behind the
budget. (Rounds 1-6 used a prime-step rotation; staleness ordering
strictly dominates it once the registry exceeds the budget.)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

ENTRY = "/root/repo/__spark_entry__.py"


def _round_index(path: str) -> int:
    """CORRECTNESS_r06.json -> 6; unparseable names sort as round 0.

    Anchored on the basename so directory segments containing "r<digits>"
    (e.g. runs2/) can never misdate the round (round-7 advice).
    """
    m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else 0


def verified_names(paths: list[str]) -> list[str]:
    from nibbledb_spark.queries import QUERIES

    last_green: dict[str, int] = {}
    latest_seen: dict[str, int] = {}
    latest_ok: dict[str, bool] = {}
    for path in paths:
        rnd = _round_index(path)
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            ok = rec.get("hash_match") is True
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
            # Track the most recent record per name: a regression (latest
            # record not hash-matched after an earlier green round) must
            # rejoin the unverified front for an immediate re-run
            # (round-7 advice). APPROX "no_oracle" rows never hash-match
            # and never went green, so they are unaffected.
            if rnd >= latest_seen.get(name, -1):
                latest_seen[name] = rnd
                latest_ok[name] = ok
    # stalest first; tie-break = registry order (dict order is load order)
    registry_pos = {n: i for i, n in enumerate(QUERIES)}
    ordered = [
        n for n in QUERIES if n in last_green and latest_ok.get(n, False)
    ]
    ordered.sort(key=lambda n: (last_green[n], registry_pos[n]))
    return ordered


def main() -> int:
    paths = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not paths:
        print(__doc__)
        return 2
    names = verified_names(paths)
    body = "\n".join(f'    "{n}",' for n in names)
    new_block = f"_DRIVER_VERIFIED = [\n{body}\n]"
    src = open(ENTRY).read()
    out, n = re.subn(
        r"_DRIVER_VERIFIED = \[.*?\]", new_block, src, count=1, flags=re.S
    )
    if n != 1:
        print("ERROR: _DRIVER_VERIFIED block not found in __spark_entry__.py")
        return 1
    open(ENTRY, "w").write(out)
    print(f"rotation updated: {len(names)} verified names moved to the back")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
