"""Every storage backend must behave identically — the reference runs its
whole unit suite once per backend (AlignmentTest::check reopens the file
through each driver, api/tests/halApiTestSupport.h:29-45,
halApiTestSupport.cpp:124-140).  Here the same behavioral checks (validate,
liftover, MAF export, blockViz blocks) run over hdf5, halz, and mmap copies
of one paralogy-rich fixture and must agree byte-for-byte."""

import io

import numpy as np
import pytest

from test_liftover_unit_port import shared_alignment

FORMATS = ["hdf5", "halz", "mmap"]


@pytest.fixture(scope="module")
def backend_files(tmp_path_factory):
    from hal_tpu.storage import save_alignment

    aln = shared_alignment()
    d = tmp_path_factory.mktemp("backends")
    paths = {}
    for fmt in FORMATS:
        p = d / ("shared." + fmt)
        save_alignment(aln, str(p), fmt=fmt)
        paths[fmt] = str(p)
    return paths


def _open(paths, fmt):
    from hal_tpu.storage import open_alignment

    return open_alignment(paths[fmt])


@pytest.mark.parametrize("fmt", FORMATS)
def test_validate_each_backend(backend_files, fmt):
    from hal_tpu.ops.validate import validate_alignment

    validate_alignment(_open(backend_files, fmt))


def _maf(aln, ref):
    from hal_tpu.io.maf_io import MafBlockBuilder
    from hal_tpu.ops.column import iter_slices_exact

    g = aln.open_genome(ref)
    b = MafBlockBuilder(aln, ref, ucsc_names=True)
    out = [blk for blk in b.feed(iter_slices_exact(aln, ref, 0, g.length))]
    tail = b.flush_end()
    return "\n".join(out + ([tail] if tail else []))


def test_maf_export_identical_across_backends(backend_files):
    ref_out = None
    for fmt in FORMATS:
        got = _maf(_open(backend_files, fmt), "child1")
        if ref_out is None:
            ref_out = got
        assert got == ref_out, "MAF differs under backend " + fmt
    assert ref_out.count("s\t")  # non-trivial output


def test_liftover_identical_across_backends(backend_files):
    from hal_tpu.ops.liftover import Liftover

    bed = ("Sequence\t0\t20\tX\t0\t+\n"
           "Sequence\t60\t80\tY\t0\t+\n")
    ref_out = None
    for fmt in FORMATS:
        aln = _open(backend_files, fmt)
        buf = io.StringIO()
        Liftover(aln, "child1", "root").convert(io.StringIO(bed), buf)
        got = buf.getvalue()
        if ref_out is None:
            ref_out = got
        assert got == ref_out, "liftover differs under backend " + fmt
    assert ref_out.strip()


def test_segment_arrays_identical_across_backends(backend_files):
    base = None
    for fmt in FORMATS:
        aln = _open(backend_files, fmt)
        snap = {}
        for name in aln.genome_names():
            g = aln.open_genome(name)
            snap[name] = (g.top_start.tolist(), g.top_parent.tolist(),
                          g.top_parent_reversed.tolist(),
                          g.top_paralogy.tolist(),
                          g.bot_start.tolist(), g.bot_child.tolist(),
                          g.bot_child_reversed.tolist(),
                          bytes(np.asarray(g.get_dna(0, g.length))))
        if base is None:
            base = snap
        assert snap == base, "segment arrays differ under backend " + fmt
