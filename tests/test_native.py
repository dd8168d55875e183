"""Native library cross-checks (skipped when native/libhaltpu.so not built)."""

import numpy as np
import pytest

from hal_tpu import dna, native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_parse_format_roundtrip():
    names = ["chr1", "chr2", "scaffold_33"]
    text = b"chr1\t0\t10\nscaffold_33\t5\t20\n# c\ntrack x\nchr2\t3\t4\n"
    cid, st, en = native.parse_bed3(text, names)
    assert cid.tolist() == [0, 2, 1]
    assert st.tolist() == [0, 5, 3]
    assert en.tolist() == [10, 20, 4]
    out = native.format_bed(cid, st, en, names)
    assert out == b"chr1\t0\t10\nscaffold_33\t5\t20\nchr2\t3\t4\n"


def test_substitution_stats_matches_numpy():
    rng = np.random.default_rng(1)
    child = dna.pack_dna(rng.choice(np.frombuffer(b"ACGTacgtN", np.uint8), 500).tobytes())
    parent = dna.pack_dna(rng.choice(np.frombuffer(b"ACGTacgtN", np.uint8), 500).tobytes())
    frags = [(0, 10, 100, 0), (150, 200, 80, 1), (300, 400, 50, 0)]
    m, s, ts, tv = native.substitution_stats(
        child, parent,
        [f[0] for f in frags], [f[1] for f in frags],
        [f[2] for f in frags], [f[3] for f in frags])
    cm = dna.unpack_dna(child, 0, 500)
    pm = dna.unpack_dna(parent, 0, 500)

    def up(x):
        return np.where((x >= 97) & (x <= 122), x - 32, x)

    tot = [0, 0, 0, 0]
    for co, po, ln, rv in frags:
        c = up(cm[co:co + ln])
        p = up(dna.reverse_complement(pm[po:po + ln].tobytes())) if rv else up(pm[po:po + ln])
        ok = (c != ord("N")) & (p != ord("N"))
        eq = ok & (c == p)
        ne = ok & ~eq
        cp = np.isin(c, [65, 71])
        pp = np.isin(p, [65, 71])
        tot[0] += eq.sum()
        tot[1] += ne.sum()
        tot[2] += (ne & (cp == pp)).sum()
        tot[3] += (ne & (cp != pp)).sum()
    assert (m, s, ts, tv) == tuple(tot)


def test_unpack_dna_matches():
    rng = np.random.default_rng(2)
    packed = dna.pack_dna(rng.choice(np.frombuffer(b"ACGTacgtn", np.uint8), 333).tobytes())
    for start, ln in [(0, 333), (1, 100), (7, 13), (330, 3)]:
        assert bytes(native.unpack_dna(packed, start, ln)) == \
            dna.unpack_dna(packed, start, ln).tobytes()
