"""benchOverlap — measure whether D2H drain can overlap device compute.

bench.py's end-to-end schedule is serial: dispatch all batches, sync,
then drain every wire buffer.  BASELINE.md/bench comments have asserted
"no overlap possible" on the axon tunnel without committed evidence
(VERDICT r4 next #5).  This experiment measures four schedules with the
same device program and the same wire bytes:

  compute-only   dispatch K compute chains, sync on a scalar
  drain-only     K fresh wire buffers fetched back-to-back (first fetch
                 of each — np.asarray caches repeat fetches)
  serial         compute all, then drain all (bench.py's schedule)
  overlapped     a single drain thread fetches wire k while the main
                 thread dispatches compute k+1

If overlapped ~= max(compute, drain), the drain rides the tunnel while
the device works and bench.py should pipeline; if overlapped ~= serial,
the "no overlap" claim stands (the transfer serializes against device
execution in the backend).  Results go to stderr + one JSON line.

The reference pays zero transfer (everything in one address space,
/root/reference/liftover/impl/halBlockLiftover.cpp:46-113), so every
recovered percent is real headline movement.
"""

from __future__ import annotations

import json
import queue
import sys
import threading
import time

import numpy as np


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=float, default=8.0, help="wire MB per batch")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--matmul", type=int, default=8192)
    p.add_argument("--chains", type=int, default=16)
    o = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    sys.stderr.write("device: %s\n" % dev)
    K = o.iters
    n_wire = int(o.mb * 1e6) // 4
    m = o.matmul

    @jax.jit
    def compute(x, seed):
        a = x + seed
        for _ in range(o.chains):
            a = (a @ a) * jnp.float32(1e-4)
        return a

    @jax.jit
    def make_wire(a, k):
        # fresh buffer per k (host-copy caching would void the timing);
        # depends on `a` so it cannot be reordered before the compute
        base = jnp.sum(a[0, :8]) * jnp.float32(1e-9)
        return base + k + jnp.arange(n_wire, dtype=jnp.float32)

    def fetch_scalar(x):
        return float(np.asarray(x.reshape(-1)[:1])[0])

    x = jnp.ones((m, m), jnp.float32)
    # warm compiles + first-op stall absorbed here
    t0 = time.time()
    a = compute(x, jnp.float32(0))
    w = make_wire(a, jnp.float32(0))
    fetch_scalar(w)
    sys.stderr.write("warm: %.1fs\n" % (time.time() - t0))

    # compute-only
    t0 = time.time()
    a = x
    for k in range(K):
        a = compute(x, jnp.float32(k))
    _ = fetch_scalar(a)
    t_compute = time.time() - t0
    sys.stderr.write("compute-only: %.2fs (%.3fs/batch)\n"
                     % (t_compute, t_compute / K))

    # drain-only: wires premade + synced, then timed first-fetches
    wires = [make_wire(a, jnp.float32(100 + k)) for k in range(K)]
    _ = fetch_scalar(wires[-1] * 0 + 1)  # sync everything
    t0 = time.time()
    tot = 0
    for wv in wires:
        tot += np.asarray(wv).nbytes
    t_drain = time.time() - t0
    sys.stderr.write("drain-only: %.2fs (%.1f MB at %.1f MB/s)\n"
                     % (t_drain, tot / 1e6, tot / t_drain / 1e6))

    # serial: bench.py's schedule
    t0 = time.time()
    wires = []
    for k in range(K):
        a2 = compute(x, jnp.float32(200 + k))
        wires.append(make_wire(a2, jnp.float32(200 + k)))
    _ = fetch_scalar(wires[-1][:1] * 0 + 1)
    for wv in wires:
        np.asarray(wv)
    t_serial = time.time() - t0
    sys.stderr.write("serial (compute all, drain all): %.2fs\n" % t_serial)

    # overlapped: one drain worker; main thread keeps dispatching
    q: "queue.Queue" = queue.Queue()
    done = []

    def drainer():
        while True:
            item = q.get()
            if item is None:
                return
            done.append(np.asarray(item).nbytes)

    th = threading.Thread(target=drainer)
    th.start()
    t0 = time.time()
    for k in range(K):
        a2 = compute(x, jnp.float32(300 + k))
        q.put(make_wire(a2, jnp.float32(300 + k)))
    q.put(None)
    th.join()
    t_overlap = time.time() - t0
    sys.stderr.write("overlapped (drain thread): %.2fs\n" % t_overlap)

    best = max(t_compute, t_drain)
    verdict = ("overlaps" if t_overlap < 0.75 * (t_compute + t_drain)
               else "serializes")
    sys.stderr.write("verdict: transfer %s with compute "
                     "(overlap %.2fs vs serial-sum %.2fs, ideal %.2fs)\n"
                     % (verdict, t_overlap, t_compute + t_drain, best))
    print(json.dumps({
        "wire_mb": round(tot / 1e6, 1), "iters": K,
        "t_compute_s": round(t_compute, 2), "t_drain_s": round(t_drain, 2),
        "t_serial_s": round(t_serial, 2), "t_overlap_s": round(t_overlap, 2),
        "overlap_efficiency": round(
            (t_compute + t_drain - t_overlap) / max(t_drain, 1e-9), 3),
        "verdict": verdict,
    }))


if __name__ == "__main__":
    main()
