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

The emitted verified list is ROTATED by 7919 x (number of correctness
files) mod its length, so the sentinel sample of already-verified
queries the driver re-checks after the unverified front differs each
round — a regression in any verified query is eventually re-caught
rather than hidden forever behind the 50-query budget. 7919 is a prime
larger than any plausible registry, so the step is coprime with the
list length and the offsets walk EVERY position over successive rounds
(a small step like 17 degenerates when the length is one of its
multiples).
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

ENTRY = "/root/repo/__spark_entry__.py"


def verified_names(paths: list[str]) -> list[str]:
    from nibbledb_spark.queries import QUERIES

    seen: set[str] = set()
    for path in paths:
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if rec.get("hash_match") is True:
                seen.add(name)
    # registry order, registry members only
    ordered = [n for n in QUERIES if n in seen]
    # per-round sentinel rotation: 7919 is prime and exceeds any
    # plausible list length, so gcd(step, len) == 1 and successive
    # rounds visit every offset
    if ordered:
        k = (7919 * len(paths)) % len(ordered)
        ordered = ordered[k:] + ordered[:k]
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
