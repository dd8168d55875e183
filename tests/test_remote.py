"""Remote (HTTP) access — UDC equivalent (reference api/impl/udc2.c,
README.md:126-131).  Serves a halz alignment from a local http.server and
verifies: remote open equals local open, laziness (untouched genomes are
never requested), range reads, and cache reuse."""

import json
import os
import threading
import urllib.request
from http.server import HTTPServer, SimpleHTTPRequestHandler

import numpy as np
import pytest

from hal_tpu.randgen import create_random_alignment
from hal_tpu.storage import open_alignment, save_alignment


class CountingHandler(SimpleHTTPRequestHandler):
    requests: list = []

    def log_message(self, *a):
        pass

    def do_GET(self):
        type(self).requests.append(self.path)
        return super().do_GET()


@pytest.fixture(scope="module")
def served_halz(tmp_path_factory):
    root = tmp_path_factory.mktemp("remote")
    aln = create_random_alignment(seed=4, max_genomes=4, min_genomes=3,
                                  min_segments=5, max_segments=20)
    save_alignment(aln, str(root / "t.halz"), fmt="halz")
    handler = type("H", (CountingHandler,), {})
    handler.requests = []
    os_dir = str(root)
    srv = HTTPServer(("127.0.0.1", 0),
                     lambda *a, **kw: handler(*a, directory=os_dir, **kw))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = "http://127.0.0.1:%d/t.halz" % srv.server_address[1]
    yield aln, url, handler
    srv.shutdown()


@pytest.fixture(autouse=True)
def udc_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("HAL_TPU_UDC_DIR", str(tmp_path / "udc"))


def test_remote_open_matches_local(served_halz):
    aln, url, handler = served_halz
    remote = open_alignment(url)
    assert remote.get_newick_tree() == aln.get_newick_tree()
    assert sorted(remote.genome_names()) == sorted(aln.genome_names())
    for name in aln.genome_names():
        a = aln.open_genome(name)
        b = remote.open_genome(name)
        assert np.array_equal(a.top_start, b.top_start)
        assert np.array_equal(a.dna, b.dna)
        assert a.seq_names == b.seq_names


def test_remote_is_lazy(served_halz):
    aln, url, handler = served_halz
    from hal_tpu.storage.remote import RemoteArray

    RemoteArray._bf_cache.clear()  # count this test's fetches only
    handler.requests.clear()
    remote = open_alignment(url)
    manifest_only = list(handler.requests)
    assert all(p.endswith("halz.json") for p in manifest_only)
    leaf = [n for n in aln.genome_names() if aln.tree.is_leaf(n)][0]
    remote.open_genome(leaf)
    touched = {p for p in handler.requests if leaf in p}
    assert touched, "opening a genome must fetch its arrays"
    others = {p for p in handler.requests
              if not p.endswith("halz.json") and leaf not in p}
    assert not others, "untouched genomes must not be fetched: %s" % others


def test_remote_cache_reuse(served_halz):
    aln, url, handler = served_halz
    remote = open_alignment(url)
    leaf = [n for n in aln.genome_names() if aln.tree.is_leaf(n)][0]
    remote.open_genome(leaf)
    n1 = len(handler.requests)
    remote2 = open_alignment(url)
    remote2.open_genome(leaf)
    n2 = len(handler.requests)
    # second open refetches only the manifest; arrays come from the cache
    assert n2 - n1 == 1


def test_fetch_range(served_halz):
    aln, url, handler = served_halz
    from hal_tpu.storage.remote import fetch_range

    whole = urllib.request.urlopen(url + "/halz.json").read()
    part = fetch_range(url + "/halz.json", 2, 10)
    assert part == whole[2:12]


def test_remote_readonly(served_halz):
    _aln, url, _h = served_halz
    with pytest.raises(ValueError):
        open_alignment(url, mode="w")


# ----------------------------------------------------- block-granular hdf5

class RangeHandler(SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler with HTTP Range support (real servers have
    it; the stdlib one does not), plus transfer accounting."""

    served_bytes = [0]

    def log_message(self, *a):
        pass

    def do_GET(self):
        rng = self.headers.get("Range")
        path = self.translate_path(self.path)
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            self.send_error(404)
            return
        if rng and rng.startswith("bytes="):
            s, e = rng[6:].split("-")
            s = int(s)
            e = min(int(e), len(data) - 1) if e else len(data) - 1
            body = data[s:e + 1]
            self.send_response(206)
            self.send_header("Content-Range",
                             "bytes %d-%d/%d" % (s, e, len(data)))
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        type(self).served_bytes[0] += len(body)


@pytest.fixture(scope="module")
def served_hdf5(tmp_path_factory):
    root = tmp_path_factory.mktemp("remote_h5")
    aln = create_random_alignment(seed=12, max_genomes=16, min_genomes=12,
                                  mean_degree=2.0, min_segments=2000,
                                  max_segments=3000, min_segment_length=8,
                                  max_segment_length=40, fast_dna=True)
    save_alignment(aln, str(root / "t.hal"), fmt="hdf5")
    handler = type("RH", (RangeHandler,), {"served_bytes": [0]})
    os_dir = str(root)
    srv = HTTPServer(("127.0.0.1", 0),
                     lambda *a, **kw: handler(*a, directory=os_dir, **kw))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = "http://127.0.0.1:%d/t.hal" % srv.server_address[1]
    yield aln, url, handler, os.path.getsize(str(root / "t.hal"))
    srv.shutdown()


def test_block_file_reads(served_hdf5):
    from hal_tpu.storage.remote import BlockFile

    aln, url, handler, size = served_hdf5
    bf = BlockFile(url, block_size=4096)
    assert bf.size == size
    import urllib.request as ur

    whole = ur.urlopen(url).read()
    bf.seek(17)
    assert bf.read(10000) == whole[17:10017]
    bf.seek(-5, 2)
    assert bf.read() == whole[-5:]
    # cached blocks are not refetched
    n = bf.requests
    bf.seek(17)
    bf.read(1000)
    assert bf.requests == n


def test_remote_hdf5_block_granular_liftover(served_hdf5):
    """The UDC contract (reference api/impl/udc2.c, README.md:126-131):
    lift one interval against a remote .hal and fetch only a fraction of
    the file — untouched genomes never cross the wire."""
    aln, url, handler, size = served_hdf5
    remote = open_alignment(url)
    bf = getattr(remote, "remote_file", None)
    assert bf is not None, "remote hdf5 must use the block-granular path"
    assert remote.get_newick_tree() == aln.get_newick_tree()

    from hal_tpu.ops import segmap_host as sm

    leaves = [n for n in sorted(aln.genome_names()) if aln.tree.is_leaf(n)]
    src, tgt = leaves[0], leaves[-1]
    g = remote.open_genome(src)
    lo = np.array([g.length // 3], np.int64)
    hi = lo + min(20, g.length // 4)
    frags = sm.map_source(remote, src, lo, hi, tgt, do_dupes=True)
    ref = sm.map_source(aln, src, lo, hi, tgt, do_dupes=True)
    assert np.array_equal(frags.tgt_lo, ref.tgt_lo)
    assert bf.bytes_fetched < size // 2, \
        "block-granular open fetched %d of %d bytes" % (bf.bytes_fetched,
                                                        size)


def test_remote_legacy_hdf5_falls_back_after_lazy_load(tmp_path):
    """The legacy mr.hal (v2.1 fixed-width seqname datatype) needs the
    relaxed-integrity open, which only applies to real file paths — the
    remote BlockFile path fails at GENOME load time, lazily.  open_remote's
    fallback must cover that late failure (round-4 review finding): the
    first open_genome transparently switches to the whole-file download."""
    import shutil

    src = "/root/reference/paf/tests/input/mr.hal"
    if not os.path.exists(src):
        pytest.skip("reference mr.hal fixture not present")
    root = tmp_path / "legacy"
    root.mkdir()
    shutil.copy(src, str(root / "mr.hal"))
    handler = type("RH", (RangeHandler,), {"served_bytes": [0]})
    os_dir = str(root)
    srv = HTTPServer(("127.0.0.1", 0),
                     lambda *a, **kw: handler(*a, directory=os_dir, **kw))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = "http://127.0.0.1:%d/mr.hal" % srv.server_address[1]
        local = open_alignment(src)
        remote = open_alignment(url)
        assert remote.get_newick_tree() == local.get_newick_tree()
        name = sorted(local.genome_names())[0]
        rg = remote.open_genome(name)
        lg = local.open_genome(name)
        assert rg.length == lg.length
        assert list(rg.seq_names) == list(lg.seq_names)
        assert np.array_equal(rg.top_start, lg.top_start)
    finally:
        srv.shutdown()


# ---------------------------------------------------- block-granular halz

def test_remote_halz_block_granular_liftover(tmp_path):
    """The native format at UDC granularity (VERDICT r4 missing #3,
    reference api/impl/udc2.c + 8 KiB blocks halCommon.h:22): lifting one
    interval against a served LARGE halz touches a small fraction of the
    segment arrays — block reads, not whole-array downloads."""
    from hal_tpu.ops import segmap_host as sm
    from hal_tpu.storage.remote import RemoteArray

    aln = create_random_alignment(seed=9, max_genomes=4, min_genomes=3,
                                  min_segments=120000, max_segments=130000,
                                  min_segment_length=30,
                                  max_segment_length=34, store_dna=False)
    save_alignment(aln, str(tmp_path / "big.halz"), fmt="halz")
    # Range support required: without it BlockFile's 200-response
    # whole-body fallback (correct for dumb servers) downloads everything
    handler = type("RH2", (RangeHandler,), {"served_bytes": [0]})
    d = str(tmp_path)
    srv = HTTPServer(("127.0.0.1", 0),
                     lambda *a, **kw: handler(*a, directory=d, **kw))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        RemoteArray._bf_cache.clear()
        url = "http://127.0.0.1:%d/big.halz" % srv.server_address[1]
        remote = open_alignment(url)
        leaves = [n for n in sorted(aln.genome_names())
                  if aln.tree.is_leaf(n)]
        src, tgt = leaves[0], leaves[-1]
        g = remote.open_genome(src)
        lo = np.array([g.length // 3], np.int64)
        hi = lo + 25
        frags = sm.map_source(remote, src, lo, hi, tgt, do_dupes=True)
        ref = sm.map_source(aln, src, lo, hi, tgt, do_dupes=True)
        assert np.array_equal(frags.tgt_lo, ref.tgt_lo)
        assert np.array_equal(frags.src_lo, ref.src_lo)
        ras = remote.remote_arrays
        assert ras, "large arrays must take the RemoteArray path"
        total = sum(ra.nbytes for (_n, _a, ra) in ras)
        fetched = sum(bf.bytes_fetched
                      for bf in {id(ra.bf): ra.bf
                                 for (_n, _a, ra) in ras}.values())
        # one interval over ~120k-segment genomes: a handful of binary
        # searches + gathers -> well under 5% of the array bytes
        assert total > 10 * 10 ** 6, total
        assert fetched < total // 20, \
            "fetched %d of %d array bytes" % (fetched, total)
    finally:
        srv.shutdown()


def test_remote_halz_blockviz_query(tmp_path):
    """Browser snake query over a REMOTE halz (the reference's UDC
    headline use case, README.md:126-131): blocks equal the local engine
    and only a fraction of the arrays crosses the wire."""
    from hal_tpu import blockviz as bv
    from hal_tpu.storage.remote import RemoteArray

    aln = create_random_alignment(seed=9, max_genomes=4, min_genomes=3,
                                  min_segments=120000, max_segments=130000,
                                  min_segment_length=30,
                                  max_segment_length=34, fast_dna=True)
    save_alignment(aln, str(tmp_path / "bv.halz"), fmt="halz")
    handler = type("RH3", (RangeHandler,), {"served_bytes": [0]})
    d = str(tmp_path)
    srv = HTTPServer(("127.0.0.1", 0),
                     lambda *a, **kw: handler(*a, directory=d, **kw))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        RemoteArray._bf_cache.clear()
        url = "http://127.0.0.1:%d/bv.halz" % srv.server_address[1]
        leaves = [n for n in sorted(aln.genome_names())
                  if aln.tree.is_leaf(n)]
        q, tg = leaves[0], leaves[-1]
        tseq = aln.open_genome(tg).seq_names[0]
        h_remote = bv.hal_open(url)
        h_local = bv.hal_open(str(tmp_path / "bv.halz"))
        got = bv.get_blocks_in_target_range(
            h_remote, q, tg, tseq, 5000, 5400,
            seq_mode=bv.HAL_LOD0_SEQUENCE)
        want = bv.get_blocks_in_target_range(
            h_local, q, tg, tseq, 5000, 5400,
            seq_mode=bv.HAL_LOD0_SEQUENCE)
        assert repr(got) == repr(want)
        ras = h_remote.aln.remote_arrays
        total = sum(ra.nbytes for (_n, _a, ra) in ras)
        fetched = sum(bf.bytes_fetched
                      for bf in {id(ra.bf): ra.bf
                                 for (_n, _a, ra) in ras}.values())
        assert fetched < total // 10, \
            "browser query fetched %d of %d bytes" % (fetched, total)
    finally:
        srv.shutdown()


def test_remote_array_semantics(tmp_path):
    """RemoteArray vs numpy on every supported access: scalars, slices,
    fancy/2-D gathers, searchsorted sides, comparisons and ufuncs."""
    from hal_tpu.storage.remote import RemoteArray

    rng = np.random.default_rng(3)
    a1 = np.sort(rng.integers(0, 10 ** 6, 5000)).astype(np.int64)
    a2 = rng.integers(-5, 5, (700, 3)).astype(np.int64)
    np.save(tmp_path / "a1.npy", a1)
    np.save(tmp_path / "a2.npy", a2)
    handler = type("RH4", (RangeHandler,), {"served_bytes": [0]})
    d = str(tmp_path)
    srv = HTTPServer(("127.0.0.1", 0),
                     lambda *a, **kw: handler(*a, directory=d, **kw))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        RemoteArray._bf_cache.clear()
        base = "http://127.0.0.1:%d" % srv.server_address[1]
        r1 = RemoteArray(base + "/a1.npy", block_size=256)
        r2 = RemoteArray(base + "/a2.npy", block_size=256)
        assert len(r1) == 5000 and r1.shape == a1.shape
        assert r2.shape == a2.shape and r2.ndim == 2
        assert r1[17] == a1[17] and r1[-1] == a1[-1]
        assert np.array_equal(r1[100:130], a1[100:130])
        idx = rng.integers(0, 5000, 40)
        assert np.array_equal(r1[idx], a1[idx])
        assert np.array_equal(r2[idx % 700, 1], a2[idx % 700, 1])
        assert np.array_equal(r2[5], a2[5])
        q = rng.integers(0, 10 ** 6, 25)
        for side in ("left", "right"):
            assert np.array_equal(np.searchsorted(r1, q, side=side),
                                  np.searchsorted(a1, q, side=side))
        assert int(np.searchsorted(r1, int(q[0]))) == \
            int(np.searchsorted(a1, int(q[0])))
        # comparisons / ufuncs materialize with numpy semantics
        assert np.array_equal(r1 != -1, a1 != -1)
        assert np.array_equal(np.minimum(r1, 5), np.minimum(a1, 5))
        assert (np.asarray(r2) == a2).all()
        # partial access stays partial: a fresh array only fetched blocks
        RemoteArray._bf_cache.clear()
        r3 = RemoteArray(base + "/a1.npy", block_size=256)
        _ = r3[4999]
        assert r3.bytes_fetched < a1.nbytes // 4
    finally:
        srv.shutdown()
