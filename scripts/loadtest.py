"""HTTP load generator for a running pockettts-tpu server.

Drives N concurrent clients against POST /tts (and optionally /tts/stream),
reports latency percentiles, time-to-first-byte for streaming, aggregate
audio-seconds per wall-second, and the server's own /stats snapshot.
Stdlib-only, so it runs anywhere the repo does.

Usage:
  python scripts/loadtest.py http://127.0.0.1:8080 [clients] [requests] [--stream]
"""

from __future__ import annotations

import json
import sys
import threading
import time
import urllib.request

BASE = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:8080"
CLIENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
REQUESTS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
STREAM = "--stream" in sys.argv
TEXT = "The quick brown fox jumps over the lazy dog near the river bank."

results = []  # (latency_s, ttfb_s, audio_bytes, status)
lock = threading.Lock()
work = list(range(REQUESTS))


def one_request() -> tuple:
    body = json.dumps({"text": TEXT}).encode()
    url = f"{BASE}/tts/stream" if STREAM else f"{BASE}/tts"
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}, method="POST"
    )
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=600) as resp:
            ttfb = None
            total = 0
            while True:
                chunk = resp.read(65536)
                if ttfb is None and chunk:
                    ttfb = time.perf_counter() - t0
                if not chunk:
                    break
                total += len(chunk)
            return (time.perf_counter() - t0, ttfb, total, resp.status)
    except Exception as exc:  # noqa: BLE001
        code = getattr(exc, "code", 0)
        return (time.perf_counter() - t0, None, 0, code or -1)


def worker():
    while True:
        with lock:
            if not work:
                return
            work.pop()
        r = one_request()
        with lock:
            results.append(r)


def pct(xs, p):
    if not xs:
        return float("nan")
    xs = sorted(xs)
    return xs[min(int(len(xs) * p / 100), len(xs) - 1)]


def main() -> int:
    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    ok = [r for r in results if r[3] == 200]
    rejected = [r for r in results if r[3] == 503]
    failed = [r for r in results if r[3] not in (200, 503)]
    lats = [r[0] for r in ok]
    ttfbs = [r[1] for r in ok if r[1] is not None]
    # 16-bit 24 kHz mono: 48000 audio bytes per second (ignoring headers).
    audio_s = sum(r[2] for r in ok) / 48_000.0

    print(
        f"{'stream' if STREAM else 'plain '}  {len(ok)}/{REQUESTS} ok "
        f"({len(rejected)} busy-503, {len(failed)} failed)  "
        f"clients={CLIENTS}  wall={wall:.2f}s"
    )
    print(
        f"latency p50={pct(lats, 50)*1e3:.0f}ms p95={pct(lats, 95)*1e3:.0f}ms "
        f"max={max(lats)*1e3:.0f}ms" if lats else "no successful requests"
    )
    if ttfbs:
        print(f"ttfb    p50={pct(ttfbs, 50)*1e3:.0f}ms p95={pct(ttfbs, 95)*1e3:.0f}ms")
    print(f"aggregate {audio_s:.1f}s audio / {wall:.2f}s wall = {audio_s/wall:.1f}x real-time")
    try:
        with urllib.request.urlopen(f"{BASE}/stats", timeout=10) as resp:
            print("server /stats:", resp.read().decode())
    except Exception:
        pass
    return 0 if not failed else 1


if __name__ == "__main__":
    sys.exit(main())
