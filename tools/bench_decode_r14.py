"""Audio/video decode-throughput bench for the backend seam (round-13
verdict task 6 — the soundfile/PyAV complement of the r13 image row):
run the REAL Arrow-batched decode stages (audio_stats_features and
video_keyframes' mapInPandas) over generated WAV / MJPEG-AVI corpora,
once per available backend, and record payloads/s. In this container
only `pure` exists; wherever soundfile / av are installed the same
script records the paired library rows — the swap is measured, not
promised.

Each backend runs in its OWN subprocess with NIBBLEDB_DECODE_BACKEND
preset (Python workers inherit the JVM-launch env; a mid-session
os.environ change never reaches them).

Usage: python tools/bench_decode_r14.py [n_payloads]
Writes BENCH_decode_r14.json.
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

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1] != "--one" else 1000


def run_one(backend: str) -> None:
    """Child mode: env is already set; build the session, decode both
    media kinds, print one JSON line each."""
    import numpy as np

    from nibbledb_spark import get_spark
    from nibbledb_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_stats_features,
        video_keyframes,
    )
    from test_extensions import _avi_mjpeg_bytes, _jpeg_bytes, _wav

    def gradient(h, w, seed):
        y, x = np.mgrid[0:h, 0:w]
        r = ((x * 255 // max(w - 1, 1)) + seed) % 256
        g = ((y * 255 // max(h - 1, 1)) + 3 * seed) % 256
        b = (x * y * 7 + x + 3 * y + seed) % 256
        return np.dstack([r, g, b]).astype(np.uint8)

    n = int(os.environ["BENCH_DECODE_N"])
    spark = get_spark(f"bench_decode14_{backend}", shuffle_partitions=32)

    # --- audio: n sine WAVs, varied freq/length ------------------------
    arows = [
        (i, "audio", bytearray(_wav(200 + i % 700, seconds=0.3)), None)
        for i in range(n)
    ]
    audio = spark.createDataFrame(arows, MEDIA_SCHEMA).repartition(32).persist()
    audio.count()
    feats = audio_stats_features(audio)
    n_ok = feats.where("decoded").count()  # warm
    t0 = time.perf_counter()
    n_ok = feats.where("decoded").count()
    a_dt = time.perf_counter() - t0
    assert n_ok == n, (backend, n_ok)

    # --- video: n/10 five-frame MJPEG AVIs -----------------------------
    nv = max(n // 10, 10)
    vrows = []
    for i in range(nv):
        frames = [_jpeg_bytes(gradient(32, 32, i * 5 + j)) for j in range(5)]
        vrows.append((i, "video", bytearray(_avi_mjpeg_bytes(frames, rate=5)), None))
    video = spark.createDataFrame(vrows, MEDIA_SCHEMA).repartition(32).persist()
    video.count()
    kf = video_keyframes(video, every_ms=200)
    n_fr = kf.where("decoded").count()  # warm
    t0 = time.perf_counter()
    n_fr = kf.where("decoded").count()
    v_dt = time.perf_counter() - t0
    assert n_fr == nv * 5, (backend, n_fr)

    print(
        "RESULT "
        + json.dumps(
            {
                "backend": backend,
                "audio_sec": round(a_dt, 3),
                "wavs_per_sec": round(n / a_dt, 1),
                "video_sec": round(v_dt, 3),
                "keyframes_per_sec": round(n_fr / v_dt, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    backends = ["pure"]
    try:
        import soundfile  # noqa: F401
        import av  # noqa: F401

        backends.append("soundfile,pyav")
    except ImportError:
        pass

    out: dict = {
        "metric": "av_decode_throughput",
        "unit": "payloads_per_sec",
        "n_payloads": N,
        "runs": {},
    }
    for backend in backends:
        env = dict(
            os.environ,
            NIBBLEDB_DECODE_BACKEND=backend,
            BENCH_DECODE_N=str(N),
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", backend],
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO,
            timeout=1800,
        )
        line = [
            l for l in proc.stdout.splitlines() if l.startswith("RESULT ")
        ]
        assert proc.returncode == 0 and line, proc.stderr[-2000:]
        rec = json.loads(line[-1][len("RESULT "):])
        out["runs"][backend] = {
            k: rec[k]
            for k in (
                "audio_sec",
                "wavs_per_sec",
                "video_sec",
                "keyframes_per_sec",
            )
        }
        print(backend, out["runs"][backend], flush=True)

    with open(os.path.join(REPO, "BENCH_decode_r14.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    if "--one" in sys.argv:
        run_one(sys.argv[sys.argv.index("--one") + 1])
    else:
        main()
