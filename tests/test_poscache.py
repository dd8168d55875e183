"""PositionCache (sorted disjoint interval set) unit tests — the contract
of the reference's api/impl/halPositionCache.cpp (insert merges adjacent
intervals, find is a point query, size counts cached positions)."""

import random

from hal_tpu.ops.poscache import PositionCache


def test_merge_and_size():
    pc = PositionCache()
    pc.add(10, 20)
    pc.add(30, 40)
    assert pc.num_intervals() == 2 and len(pc) == 20
    pc.add(20, 30)  # bridges -> one interval
    assert pc.num_intervals() == 1 and len(pc) == 30
    assert pc.covers(10, 40) and not pc.covers(9, 40) and not pc.covers(10, 41)
    assert pc.contains(10) and pc.contains(39) and not pc.contains(40)


def test_interval_at_and_free_run():
    pc = PositionCache()
    pc.add(5, 10)
    pc.add(20, 25)
    assert pc.interval_at(7) == (5, 10)
    assert pc.interval_at(10) is None
    assert pc.free_run(10, True) == 10   # 10..19 free before 20
    assert pc.free_run(7, True) == 0     # cached
    assert pc.free_run(19, False) == 10  # 10..19 free after 9
    assert pc.free_run(4, False) > 1 << 60  # unbounded to the left


def test_against_set_oracle():
    rng = random.Random(7)
    pc = PositionCache()
    seen = set()
    for _ in range(300):
        lo = rng.randrange(0, 500)
        hi = lo + rng.randrange(1, 30)
        pc.add(lo, hi)
        seen.update(range(lo, hi))
        assert len(pc) == len(seen)
    for p in range(-5, 540):
        assert pc.contains(p) == (p in seen)
    # intervals are disjoint, sorted, non-adjacent
    for k in range(pc.num_intervals() - 1):
        assert pc._hi[k] < pc._lo[k + 1]


def test_empty_and_degenerate():
    pc = PositionCache()
    assert not pc.contains(0) and pc.interval_at(3) is None
    pc.add(5, 5)  # empty interval is a no-op
    assert len(pc) == 0 and pc.num_intervals() == 0
    assert pc.free_run(123, True) > 1 << 60
