"""Reference mmap-format interop: open a genuinely reference-produced file
(the legacy v1.0 fixture shipped with the reference's extract tests) and
check the full data model decodes — tree, dimensions, DNA, invariants, and a
cross-genome mapping (reference api/mmap_impl/, fixture
extract/tests/input/small.mmap1.0.hal.bz2)."""

import bz2
import os

import numpy as np
import pytest

FIXTURE = "/root/reference/extract/tests/input/small.mmap1.0.hal.bz2"


@pytest.fixture(scope="module")
def mmap_hal(tmp_path_factory):
    if not os.path.exists(FIXTURE):
        pytest.skip("reference mmap fixture not available")
    out = tmp_path_factory.mktemp("mmap") / "small.hal"
    with bz2.open(FIXTURE, "rb") as src, open(out, "wb") as dst:
        dst.write(src.read())
    return str(out)


def test_detect_and_open(mmap_hal):
    from hal_tpu.storage import detect_format
    from hal_tpu import open_alignment

    assert detect_format(mmap_hal) == "mmap"
    a = open_alignment(mmap_hal)
    names = a.genome_names()
    assert a.tree.root == "Genome_0" and len(names) == 4
    g1 = a.open_genome("Genome_1")
    # internal genome: both segment arrays populated
    assert g1.num_top_segments > 0 and g1.num_bottom_segments > 0
    assert g1.seq_names == ["Genome_1_seq"]
    assert int(g1.seq_start[-1]) == g1.length


def test_open_for_update(mmap_hal):
    """mmap files open for update since the write path landed (edits are
    materialized via save(), not in-place page writes)."""
    from hal_tpu import open_alignment

    aln = open_alignment(mmap_hal, mode="r+")
    assert aln.num_genomes > 0


def test_validates_and_decodes_dna(mmap_hal):
    from hal_tpu import open_alignment
    from hal_tpu.ops import validate
    from hal_tpu.dna import unpack_dna

    a = open_alignment(mmap_hal)
    validate.validate_alignment(a)
    g = a.open_genome("Genome_0")
    s = unpack_dna(np.asarray(g.dna), 0, min(200, g.length))
    assert set(bytes(s).upper().decode()) <= set("ACGTN")


def test_cross_genome_mapping(mmap_hal):
    from hal_tpu import open_alignment
    from hal_tpu.ops import segmap_host as sm

    a = open_alignment(mmap_hal)
    fr = sm.map_source(a, "Genome_3", np.array([100]), np.array([400]),
                       "Genome_2", do_dupes=True)
    assert len(fr.src_lo) >= 1
    assert int((fr.tgt_hi - fr.tgt_lo).sum()) > 0
    # source/target fragment widths stay column-aligned
    assert ((fr.src_hi - fr.src_lo) == (fr.tgt_hi - fr.tgt_lo)).all()


def test_halextract_converts_mmap_to_halz(mmap_hal, tmp_path):
    """the reference's official converter role (extract/impl/halExtract.cpp)"""
    import subprocess
    import sys

    out = str(tmp_path / "conv.halz")
    r = subprocess.run(
        [sys.executable, "-m", "hal_tpu.tools.halExtract", mmap_hal, out],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    from hal_tpu import open_alignment
    from hal_tpu.dna import unpack_dna

    a = open_alignment(mmap_hal)
    b = open_alignment(out)
    assert a.genome_names() == b.genome_names()
    for n in a.genome_names():
        ga, gb = a.open_genome(n), b.open_genome(n)
        assert ga.length == gb.length
        assert ga.num_top_segments == gb.num_top_segments
        assert ga.num_bottom_segments == gb.num_bottom_segments
        np.testing.assert_array_equal(
            unpack_dna(np.asarray(ga.dna), 0, ga.length),
            unpack_dna(np.asarray(gb.dna), 0, gb.length))


def test_mmap_write_roundtrip(tmp_path):
    """mmap write path (VERDICT missing #8): save -> load preserves every
    array, names, metadata, newick; halExtract --outputFormat mmap works."""
    import numpy as np

    from hal_tpu.randgen import create_random_alignment
    from hal_tpu.storage import mmap_driver, open_alignment
    from hal_tpu.ops.validate import validate_alignment

    aln = create_random_alignment(seed=3, max_genomes=6, min_segments=4,
                                  max_segments=20, min_segment_length=3,
                                  max_segment_length=10)
    aln.open_genome(aln.root_name).metadata["source"] = "roundtrip"
    p = tmp_path / "rt.mmap.hal"
    mmap_driver.save(aln, str(p))
    aln2 = open_alignment(str(p))
    validate_alignment(aln2)
    assert aln2.get_newick_tree() == aln.get_newick_tree()
    for n in aln.genome_names():
        a, b = aln.open_genome(n), aln2.open_genome(n)
        for f in ("seq_start", "seq_top", "seq_bot", "top_start", "top_parent",
                  "top_parent_reversed", "top_bottom_parse", "top_paralogy",
                  "bot_start", "bot_top_parse", "bot_child", "bot_child_reversed"):
            assert np.array_equal(getattr(a, f), getattr(b, f)), (n, f)
        assert np.array_equal(np.asarray(a.dna), np.asarray(b.dna))
        assert a.seq_names == b.seq_names
        assert a.metadata == b.metadata


def test_halExtract_mmap_roundtrip(tmp_path):
    import subprocess
    import sys

    from hal_tpu.randgen import create_random_alignment
    from hal_tpu.storage import hdf5_driver, open_alignment

    aln = create_random_alignment(seed=4, max_genomes=4, min_segments=3,
                                  max_segments=12, min_segment_length=2,
                                  max_segment_length=8)
    src = tmp_path / "a.hal"
    hdf5_driver.save(aln, str(src))
    mm = tmp_path / "a.mmap.hal"
    back = tmp_path / "b.hal"
    for args in (["--outputFormat", "mmap", str(src), str(mm)],
                 ["--outputFormat", "hdf5", str(mm), str(back)]):
        r = subprocess.run([sys.executable, "-m", "hal_tpu.tools.halExtract"] + args,
                           capture_output=True)
        assert r.returncode == 0, r.stderr.decode()
    a2 = open_alignment(str(back))
    assert a2.get_newick_tree() == aln.get_newick_tree()
    g1 = aln.open_genome(aln.root_name)
    g2 = a2.open_genome(aln.root_name)
    import numpy as np

    assert np.array_equal(g1.bot_start, g2.bot_start)
