"""HTTP load-generator client — the reference's ``test/client.re``
(82 LoC, cohttp/lwt) re-expressed over stdlib urllib so the same
smoke/load runs drive this engine's live server.

Flag-for-flag port of the reference CLI (test/client.re:49-72):

    python tools/client.py --uri http://127.0.0.1:8000/ts/foo \
        --payload '{"value": 42}' --format json --loop 10 --freq 0.1
    python tools/client.py --uri ... --file --payload butterflies.json

- ``--uri``      target (default http://127.0.0.1:8000/ts/foo,
                 client.re:5)
- ``--payload``  POST body, default ``{"value": 42}`` (client.re:9);
                 with ``--file``, the path of a file whose CONTENTS
                 become the payload (client.re:74-77)
- ``--format``   text | json | binary -> Content-Type header
                 (client.re:38-47)
- ``--loop``     number of POSTs (client.re:24-35 post_loop)
- ``--freq``     seconds to sleep between POSTs (client.re:30)

Like the reference, each successful POST prints ``=> Created``; unlike
the reference (which ignores the status entirely), a non-2xx response
terminates with the server's error body on stderr and exit code 1 —
silent failure is the one client.re behavior not worth keeping.
"""

from __future__ import annotations

import argparse
import sys
import time
import urllib.error
import urllib.request

FORMATS = {
    "text": "text/plain",
    "json": "application/json",
    "binary": "application/octet-stream",
}


def post_once(uri: str, payload: str, content_type: str) -> tuple[int, str]:
    req = urllib.request.Request(
        uri,
        data=payload.encode("utf-8"),
        method="POST",
        headers={"Content-Type": content_type, "Connection": "keep-alive"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as e:  # 4xx/5xx still carry a body
        return e.code, e.read().decode("utf-8", "replace")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="nibbledb load-generator (port of test/client.re)"
    )
    ap.add_argument("--uri", default="http://127.0.0.1:8000/ts/foo")
    ap.add_argument("--payload", default='{"value": 42}')
    ap.add_argument("--format", choices=sorted(FORMATS), default="json")
    ap.add_argument("--loop", type=int, default=0)
    ap.add_argument("--freq", type=float, default=1.0)
    ap.add_argument("--file", action="store_true")
    args = ap.parse_args(argv)

    payload = args.payload
    if args.file:
        with open(payload) as f:
            payload = f.read()

    # client.re's post_loop always sends once, then recurses while
    # n > 1 — so --loop 0 (the reference default) still POSTs exactly
    # once; mirror that instead of silently doing nothing
    n_posts = max(1, args.loop)
    for i in range(n_posts):
        status, body = post_once(args.uri, payload, FORMATS[args.format])
        if not 200 <= status < 300:
            print(f"Error: HTTP {status}: {body}", file=sys.stderr)
            return 1
        print("=> Created")
        if i + 1 < n_posts and args.freq > 0:
            time.sleep(args.freq)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
