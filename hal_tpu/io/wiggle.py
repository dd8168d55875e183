"""Wiggle (fixedStep/variableStep) parsing and emission
(reference liftover/impl/halWiggleScanner.cpp, halWiggleLiftover.cpp)."""

from __future__ import annotations

import numpy as np


def read_wiggle(stream):
    """Yield (sequence_name, positions ndarray, values ndarray) batches, one
    per header block.  Positions are 0-based sequence-relative."""
    seq = None
    fixed = True
    start = 0
    step = 1
    span = 1
    positions: list[int] = []
    values: list[float] = []

    def flush():
        nonlocal positions, values
        if seq is not None and positions:
            yield_batch = (seq, np.asarray(positions, np.int64), np.asarray(values, np.float64))
            positions, values = [], []
            return yield_batch
        positions, values = [], []
        return None

    for line in stream:
        s = line.strip()
        if not s or s.startswith("#") or s.startswith("track") or s.startswith("browser"):
            continue
        f = s.split()
        if f[0] in ("fixedStep", "variableStep"):
            b = flush()
            if b:
                yield b
            kv = dict(x.split("=", 1) for x in f[1:] if "=" in x)
            seq = kv.get("chrom")
            fixed = f[0] == "fixedStep"
            start = int(kv.get("start", 1)) - 1
            step = int(kv.get("step", 1))
            span = int(kv.get("span", 1))
            n = 0
        else:
            if seq is None:
                raise ValueError("wiggle value before header: " + s)
            if fixed:
                v = float(f[0])
                for k in range(span):
                    positions.append(start + k)
                    values.append(v)
                start += step
            else:
                p = int(f[0]) - 1
                v = float(f[1])
                for k in range(span):
                    positions.append(p + k)
                    values.append(v)
    b = flush()
    if b:
        yield b


def write_wiggle_runs(out, seq_name: str, positions: np.ndarray, values: np.ndarray):
    """Emit fixedStep step=1 blocks over runs of consecutive positions."""
    if len(positions) == 0:
        return
    order = np.argsort(positions, kind="stable")
    p = positions[order]
    v = values[order]
    # last value wins on duplicates
    keep = np.concatenate([p[1:] != p[:-1], [True]])
    p, v = p[keep], v[keep]
    brk = np.concatenate([[True], p[1:] != p[:-1] + 1])
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], len(p))
    for a, b in zip(starts, ends):
        out.write("fixedStep chrom=%s start=%d step=1\n" % (seq_name, int(p[a]) + 1))
        out.write("\n".join("%g" % x for x in v[a:b]))
        out.write("\n")
