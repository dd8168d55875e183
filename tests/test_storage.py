import numpy as np
import pytest

from hal_tpu import open_alignment
from hal_tpu.randgen import create_random_alignment
from hal_tpu.ops.validate import validate_alignment
from hal_tpu.storage import save_alignment, detect_format


def _assert_alignments_equal(a, b):
    assert a.genome_names() == b.genome_names()
    assert a.get_newick_tree() == b.get_newick_tree()
    assert a.metadata == b.metadata
    for n in a.genome_names():
        ga, gb = a.open_genome(n), b.open_genome(n)
        assert ga.seq_names == gb.seq_names
        for arr in ("seq_start", "seq_top", "seq_bot", "top_start", "top_parent",
                    "top_parent_reversed", "top_bottom_parse", "top_paralogy",
                    "bot_start", "bot_top_parse", "bot_child", "bot_child_reversed", "dna"):
            assert np.array_equal(getattr(ga, arr), getattr(gb, arr)), (n, arr)
        assert ga.metadata == gb.metadata


@pytest.fixture(scope="module")
def aln():
    a = create_random_alignment(seed=11, max_genomes=6, min_segments=3, max_segments=40,
                                min_segment_length=3, max_segment_length=17)
    a.metadata["pipeline"] = "test"
    a.open_genome(a.root_name).metadata["assembly"] = "v1"
    return a


def test_hdf5_roundtrip(aln, tmp_path):
    p = str(tmp_path / "test.hal")
    save_alignment(aln, p, fmt="hdf5")
    assert detect_format(p) == "hdf5"
    b = open_alignment(p)
    _assert_alignments_equal(aln, b)
    validate_alignment(b)


def test_halz_roundtrip(aln, tmp_path):
    p = str(tmp_path / "test.halz")
    save_alignment(aln, p, fmt="halz")
    assert detect_format(p) == "halz"
    b = open_alignment(p)
    _assert_alignments_equal(aln, b)
    validate_alignment(b)


def test_hdf5_to_halz_conversion(aln, tmp_path):
    """halExtract-style format conversion (reference extract/impl/halExtract.cpp)."""
    p1 = str(tmp_path / "a.hal")
    p2 = str(tmp_path / "b.halz")
    save_alignment(aln, p1, fmt="hdf5")
    save_alignment(open_alignment(p1), p2, fmt="halz")
    _assert_alignments_equal(aln, open_alignment(p2))


def test_hdf5_layout_is_reference_shaped(aln, tmp_path):
    """The file must contain the reference's exact group/dataset names
    (api/hdf5_impl/hdf5Genome.cpp:29-33, hdf5Alignment.cpp:36-39)."""
    import h5py

    p = str(tmp_path / "layout.hal")
    save_alignment(aln, p, fmt="hdf5")
    with h5py.File(p, "r") as f:
        assert set(f.keys()) >= {"Meta", "Phylogeny", "Verison", "Genomes"}
        assert f["Verison"].attrs["Verison"] in (b"2.3", "2.3")
        name = aln.root_name
        grp = f["Genomes"][name]
        for ds in ("TOP_ARRAY", "BOTTOM_ARRAY", "SEQIDX_ARRAY", "SEQNAME_ARRAY"):
            assert ds in grp
        tops = grp["TOP_ARRAY"]
        assert tops.dtype.names == ("genomeIdx", "bottomIdx", "paralogyIdx", "parentIdx", "reverseFlag")
        g = aln.open_genome(name)
        assert tops.shape[0] == g.num_top_segments + 1
        bots = grp["BOTTOM_ARRAY"]
        assert bots.shape[0] == g.num_bottom_segments + 1
        assert "length" in bots.dtype.names


def test_halz_dirty_flag(aln, tmp_path):
    import json, os

    p = str(tmp_path / "dirty.halz")
    save_alignment(aln, p, fmt="halz")
    mpath = os.path.join(p, "halz.json")
    m = json.load(open(mpath))
    m["dirty"] = True
    json.dump(m, open(mpath, "w"))
    with pytest.raises(IOError):
        open_alignment(p)


def test_lazy_loading(aln, tmp_path):
    p = str(tmp_path / "lazy.halz")
    save_alignment(aln, p, fmt="halz")
    b = open_alignment(p)
    assert len(b._genomes) == 0
    b.open_genome(b.root_name)
    assert len(b._genomes) == 1
    b.close_genome(b.root_name)
    assert len(b._genomes) == 0
