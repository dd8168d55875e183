"""Native bigWig/bigBed writers (hal_tpu.io.bbi) decoded by an
INDEPENDENT struct-level reader (the test_mmap_struct_decode pattern):
headers, chrom B+ tree, R-tree traversal, data sections, zoom summaries
and total summary are all reconstructed from bytes and checked against
the inputs — no shared code with the writer beyond the struct module."""

import struct
import zlib

import numpy as np
import pytest

from hal_tpu.io import bbi


def _blk(buf, off, size, uncomp):
    raw = buf[off:off + size]
    return zlib.decompress(raw) if uncomp else raw


def _read_header(buf):
    (magic, version, zoom_levels, chrom_tree, full_data, full_index,
     field_count, defined_fields, autosql, summary, uncomp,
     _res) = struct.unpack_from("<IHHQQQHHQQIQ", buf, 0)
    zooms = []
    off = 64
    for _ in range(zoom_levels):
        zooms.append(struct.unpack_from("<IIQQ", buf, off))
        off += 24
    return dict(magic=magic, version=version, zoom_levels=zoom_levels,
                chrom_tree=chrom_tree, full_data=full_data,
                full_index=full_index, field_count=field_count,
                defined_fields=defined_fields, summary=summary,
                uncomp=uncomp, zooms=zooms)


def _read_chroms(buf, off):
    magic, block_size, key_size, val_size, count, _ = struct.unpack_from(
        "<IIIIQQ", buf, off)
    assert magic == bbi.BPT_MAGIC and val_size == 8
    out = {}

    def node(at):
        is_leaf, _, n = struct.unpack_from("<BBH", buf, at)
        assert n <= block_size
        at += 4
        for _ in range(n):
            key = buf[at:at + key_size].split(b"\x00")[0].decode()
            if is_leaf:
                cid, size = struct.unpack_from("<II", buf, at + key_size)
                out[cid] = (key, size)
            else:
                (child,) = struct.unpack_from("<Q", buf, at + key_size)
                node(child)
            at += key_size + 8

    node(off + 32)
    assert len(out) == count
    return out


def _rtree_leaves(buf, off):
    """Traverse the R-tree from its header; return leaf entries."""
    magic, block_size, n_items, s_cix, s_base, e_cix, e_base, end_off, \
        per_slot, _ = struct.unpack_from("<IIQIIIIQII", buf, off)
    assert magic == bbi.CIR_MAGIC
    leaves = []

    def node(at):
        is_leaf, _, cnt = struct.unpack_from("<BBH", buf, at)
        at += 4
        for _ in range(cnt):
            if is_leaf:
                e = struct.unpack_from("<IIIIQQ", buf, at)
                leaves.append(e)
                at += 32
            else:
                e = struct.unpack_from("<IIIIQ", buf, at)
                node(e[4])
                at += 24
        return at

    node(off + 48)
    assert len(leaves) == n_items
    return leaves, (s_cix, s_base, e_cix, e_base, end_off)


def _decode_bigwig(path):
    buf = open(path, "rb").read()
    h = _read_header(buf)
    assert h["magic"] == bbi.BIGWIG_MAGIC and h["version"] == 4
    chroms = _read_chroms(buf, h["chrom_tree"])
    (n_sections,) = struct.unpack_from("<Q", buf, h["full_data"])
    leaves, bounds = _rtree_leaves(buf, h["full_index"])
    runs = {}
    for (scx, sb, ecx, eb, off, size) in leaves:
        blk = _blk(buf, off, size, h["uncomp"])
        cid, c_start, c_end, step, span, typ, _r, cnt = struct.unpack_from(
            "<IIIIIBBH", blk, 0)
        assert typ == 1  # bedGraph sections
        assert (scx, sb, ecx, eb) == (cid, c_start, cid, c_end)
        assert len(blk) <= max(h["uncomp"], len(blk))
        p = 24
        for _ in range(cnt):
            s, e, v = struct.unpack_from("<IIf", blk, p)
            runs.setdefault(chroms[cid][0], []).append((s, e, v))
            p += 12
        assert p == len(blk)
    summary = struct.unpack_from("<Qdddd", buf, h["summary"])
    return h, chroms, runs, summary, n_sections


def test_bigwig_roundtrip(tmp_path):
    data = {
        "chr1": [(0, 10, 1.5), (10, 30, -2.0), (100, 164, 7.25)],
        "chr2": [(5, 6, 0.5)],
    }
    sizes = {"chr1": 1000, "chr2": 500}
    p = str(tmp_path / "t.bw")
    bbi.write_bigwig(p, sizes, data)
    h, chroms, runs, summary, n_sections = _decode_bigwig(p)
    assert {c[0]: c[1] for c in chroms.values()} == sizes
    assert set(runs) == set(data)
    for c in data:
        got = [(s, e, round(v, 4)) for s, e, v in runs[c]]
        assert got == [(s, e, round(float(v), 4)) for s, e, v in data[c]]
    covered = sum(e - s for rs in data.values() for s, e, _ in rs)
    assert summary[0] == covered
    assert summary[1] == -2.0 and summary[2] == 7.25
    total = sum((e - s) * v for rs in data.values() for s, e, v in rs)
    assert abs(summary[3] - total) < 1e-9
    # zoom LADDER: every level's records cover the data, reductions grow
    assert h["zoom_levels"] >= 1
    buf = open(p, "rb").read()
    reds = [z[0] for z in h["zooms"]]
    assert reds == sorted(reds)
    for (red, _r, zd, zi) in h["zooms"]:
        (n_z,) = struct.unpack_from("<I", buf, zd)
        assert n_z > 0
        zleaves, _ = _rtree_leaves(buf, zi)
        zcov = 0
        for (scx, sb, ecx, eb, off, size) in zleaves:
            blk = _blk(buf, off, size, h["uncomp"])
            for k in range(len(blk) // 32):
                cid, s, e, valid, mn, mx, sm, sq = struct.unpack_from(
                    "<IIIIffff", blk, 32 * k)
                zcov += valid
                assert mn <= mx
        assert zcov == covered


def test_wig_to_bigwig_fixedstep(tmp_path):
    wig = tmp_path / "t.wig"
    wig.write_text("fixedStep chrom=chrA start=11 step=1\n1\n2\n3\n"
                   "variableStep chrom=chrA span=2\n31 9.5\n")
    p = str(tmp_path / "t.bw")
    bbi.wig_to_bigwig(str(wig), {"chrA": 100}, p)
    _h, _c, runs, summary, _n = _decode_bigwig(p)
    assert runs["chrA"] == [(10, 11, 1.0), (11, 12, 2.0), (12, 13, 3.0),
                            (30, 32, 9.5)]
    assert summary[0] == 5


def test_bigbed_roundtrip(tmp_path):
    beds = [("chr2", 7, 20, "featB\t0\t-"),
            ("chr1", 0, 5, "featA\t0\t+"),
            ("chr1", 50, 60, "featC\t0\t+")]
    sizes = {"chr1": 100, "chr2": 80}
    p = str(tmp_path / "t.bb")
    bbi.write_bigbed(p, sizes, beds, field_count=6)
    buf = open(p, "rb").read()
    h = _read_header(buf)
    assert h["magic"] == bbi.BIGBED_MAGIC
    assert h["field_count"] == 6 and h["defined_fields"] == 6
    chroms = _read_chroms(buf, h["chrom_tree"])
    (n_items,) = struct.unpack_from("<Q", buf, h["full_data"])
    assert n_items == 3
    leaves, _ = _rtree_leaves(buf, h["full_index"])
    got = []
    for (scx, sb, ecx, eb, off, size) in leaves:
        blk = _blk(buf, off, size, h["uncomp"])
        p2 = 0
        while p2 < len(blk):
            cid, s, e = struct.unpack_from("<III", blk, p2)
            p2 += 12
            rest_end = blk.index(b"\x00", p2)
            got.append((chroms[cid][0], s, e, blk[p2:rest_end].decode()))
            p2 = rest_end + 1
    want = sorted(beds, key=lambda b: (b[0], b[1]))
    assert got == want


def test_multilevel_rtree(tmp_path, monkeypatch):
    """Force many small blocks so the R-tree needs an internal root."""
    monkeypatch.setattr(bbi, "ITEMS_PER_SLOT", 4)
    monkeypatch.setattr(bbi, "BLOCK_SIZE", 8)
    rng = np.random.default_rng(0)
    runs = []
    pos = 0
    for _ in range(400):  # 100 sections of 4 runs -> 13 leaf nodes
        ln = int(rng.integers(1, 5))
        runs.append((pos, pos + ln, float(rng.normal())))
        pos += ln + int(rng.integers(0, 3))
    data = {"chrZ": runs}
    p = str(tmp_path / "big.bw")
    bbi.write_bigwig(p, {"chrZ": pos + 10}, data)
    _h, _c, got, summary, n_sections = _decode_bigwig(p)
    assert n_sections == 100
    assert [(s, e) for s, e, _ in got["chrZ"]] == \
        [(s, e) for s, e, _ in runs]
    np.testing.assert_allclose([v for _, _, v in got["chrZ"]],
                               [v for _, _, v in runs], rtol=1e-6)
    assert summary[0] == sum(e - s for s, e, _ in runs)


def test_rtree_query_bounds(tmp_path):
    """Manual stabbing query through the index finds exactly the blocks
    overlapping a range (what a browser does)."""
    data = {"c%02d" % i: [(j * 100, j * 100 + 50, float(i + j))
                          for j in range(20)] for i in range(4)}
    sizes = {c: 5000 for c in data}
    p = str(tmp_path / "q.bw")
    bbi.write_bigwig(p, sizes, data)
    buf = open(p, "rb").read()
    h = _read_header(buf)
    chroms = _read_chroms(buf, h["chrom_tree"])
    name2id = {v[0]: k for k, v in chroms.items()}
    leaves, _ = _rtree_leaves(buf, h["full_index"])
    cid = name2id["c02"]
    q_lo, q_hi = 330, 480
    hits = [e for e in leaves
            if not (e[0] > cid or (e[0] == cid and e[1] >= q_hi))
            and not (e[2] < cid or (e[2] == cid and e[3] <= q_lo))]
    assert len(hits) == 1
    blk = _blk(buf, hits[0][4], hits[0][5], h["uncomp"])
    _cid, c_start, c_end = struct.unpack_from("<III", blk, 0)[:3]
    assert c_start <= q_lo < q_hi <= c_end or (c_start, c_end) == (0, 1950)


def test_bigwig_rejects_overlap(tmp_path):
    """kent's wigToBigWig errors on overlapping runs; silent acceptance
    would corrupt R-tree bounds and summaries (round-4 review finding)."""
    with pytest.raises(ValueError, match="overlap"):
        bbi.write_bigwig(str(tmp_path / "o.bw"), {"c": 200},
                         {"c": [(0, 100, 1.0), (5, 7, 2.0)]})


def test_bigbed_union_coverage(tmp_path):
    """Overlapping BED features are routine; coverage summaries must
    count the UNION of covered bases, never more than the chrom span."""
    p = str(tmp_path / "o.bb")
    bbi.write_bigbed(p, {"c": 200},
                     [("c", 0, 100), ("c", 50, 150), ("c", 160, 170)])
    buf = open(p, "rb").read()
    h = _read_header(buf)
    summary = struct.unpack_from("<Qdddd", buf, h["summary"])
    assert summary[0] == 160  # union of [0,150) and [160,170)


def test_bigbed_depth_summary(tmp_path):
    """Summaries reflect overlap DEPTH (kent bedToBigBed semantics): max
    is the deepest coverage, sum integrates depth over covered bases."""
    p = str(tmp_path / "d.bb")
    bbi.write_bigbed(p, {"c": 200},
                     [("c", 0, 100), ("c", 50, 150), ("c", 160, 170)])
    buf = open(p, "rb").read()
    h = _read_header(buf)
    valid, mn, mx, sm, sq = struct.unpack_from("<Qdddd", buf, h["summary"])
    assert valid == 160           # union bases
    assert mn == 1.0 and mx == 2.0
    # depth runs: [0,50)x1 [50,100)x2 [100,150)x1 [160,170)x1
    assert sm == 50 * 1 + 50 * 2 + 50 * 1 + 10 * 1
    assert sq == 50 * 1 + 50 * 4 + 50 * 1 + 10 * 1


def test_chrom_bpt_multilevel(tmp_path, monkeypatch):
    """> BLOCK_SIZE sequences force index levels in the chrom B+ tree."""
    monkeypatch.setattr(bbi, "BLOCK_SIZE", 4)
    sizes = {"chr%03d" % i: 100 + i for i in range(37)}  # 37 > 4^2
    data = {c: [(0, 10, 1.0)] for c in sizes}
    p = str(tmp_path / "many.bw")
    bbi.write_bigwig(p, sizes, data)
    _h, chroms, runs, summary, _n = _decode_bigwig(p)
    assert {c[0]: c[1] for c in chroms.values()} == sizes
    assert set(runs) == set(sizes)
    assert summary[0] == 10 * len(sizes)


def test_compressed_vs_uncompressed_equal_payload(tmp_path):
    """compress=False produces the same decoded runs, and the compressed
    file declares uncompressBufSize >= every section's raw size."""
    data = {"chr1": [(i * 7, i * 7 + 5, float(i)) for i in range(4000)]}
    sizes = {"chr1": 40000}
    pc = str(tmp_path / "c.bw")
    pu = str(tmp_path / "u.bw")
    bbi.write_bigwig(pc, sizes, data)
    bbi.write_bigwig(pu, sizes, data, compress=False)
    hc, _c1, rc, sc, _n1 = _decode_bigwig(pc)
    hu, _c2, ru, su, _n2 = _decode_bigwig(pu)
    assert hc["uncomp"] > 0 and hu["uncomp"] == 0
    assert rc == ru and sc == su
    import os

    assert os.path.getsize(pc) < os.path.getsize(pu)
    # multiple zoom levels on a many-item wiggle
    assert hc["zoom_levels"] >= 2
