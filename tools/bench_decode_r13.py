"""Decode-throughput bench for the backend seam (round-12 verdict task
7): run the REAL Arrow-batched decode stage (image_stats_features'
mapInPandas) over a generated mixed-codec corpus, once per available
backend, and record images/s. In this container only `pure` exists;
wherever Pillow is installed the same script records the paired `pil`
row — the swap is measured, not promised.

Each backend runs in its OWN subprocess with NIBBLEDB_DECODE_BACKEND
preset: Python workers inherit the env of the JVM at launch, so a
mid-session os.environ change never reaches them (measured — a worker
probe sees UNSET). On a cluster the equivalent is
spark.executorEnv.NIBBLEDB_DECODE_BACKEND at session build.

Usage: python tools/bench_decode_r13.py [n_images]
Writes BENCH_decode_r13.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1] != "--one" else 2000


def run_one(backend: str) -> None:
    """Child mode: env is already set; build the session, decode, print
    one JSON line."""
    import numpy as np

    from nibbledb_spark import get_spark
    from nibbledb_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_stats_features,
    )
    from test_extensions import _jpeg_bytes, _png_bytes

    def gradient(h, w, seed):
        y, x = np.mgrid[0:h, 0:w]
        r = ((x * 255 // max(w - 1, 1)) + seed) % 256
        g = ((y * 255 // max(h - 1, 1)) + 3 * seed) % 256
        b = (x * y * 7 + x + 3 * y + seed) % 256
        return np.dstack([r, g, b]).astype(np.uint8)

    n = int(os.environ["BENCH_DECODE_N"])
    spark = get_spark(f"bench_decode_{backend}", shuffle_partitions=32)
    rows = []
    for i in range(n):
        img = gradient(48 + i % 3, 64 + i % 5, i)
        payload = _jpeg_bytes(img) if i % 2 else _png_bytes(img, 2, i % 5)
        rows.append((i, "image", bytearray(payload), None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32).persist()
    media.count()

    feats = image_stats_features(media)
    n_ok = feats.where("decoded").count()  # warm
    t0 = time.perf_counter()
    n_ok = feats.where("decoded").count()
    dt = time.perf_counter() - t0
    assert n_ok == n, (backend, n_ok)
    print("RESULT " + json.dumps(
        {"backend": backend, "sec": round(dt, 3),
         "images_per_sec": round(n / dt, 1)}
    ))
    spark.stop()


def main() -> None:
    backends = ["pure"]
    try:
        import PIL  # noqa: F401

        backends.append("pil")
    except ImportError:
        pass

    out: dict = {"metric": "decode_throughput", "unit": "images_per_sec",
                 "n_images": N, "runs": {}}
    for backend in backends:
        env = dict(
            os.environ,
            NIBBLEDB_DECODE_BACKEND=backend,
            BENCH_DECODE_N=str(N),
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", backend],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        assert proc.returncode == 0 and line, proc.stderr[-2000:]
        rec = json.loads(line[-1][len("RESULT "):])
        out["runs"][backend] = {k: rec[k] for k in ("sec", "images_per_sec")}
        print(backend, out["runs"][backend], flush=True)

    with open(os.path.join(REPO, "BENCH_decode_r13.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    if "--one" in sys.argv:
        run_one(sys.argv[sys.argv.index("--one") + 1])
    else:
        main()
