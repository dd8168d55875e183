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


def test_read_only(mmap_hal):
    from hal_tpu import open_alignment

    with pytest.raises(ValueError):
        open_alignment(mmap_hal, mode="r+")


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
