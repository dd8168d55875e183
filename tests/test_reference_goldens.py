"""Byte-equality tests against the reference's shipped golden outputs.

These are the only ground-truth artifacts available without building the
reference: expected tool outputs checked into /root/reference/*/tests/expected
plus two binary alignment fixtures (paf/tests/input/mr.hal — a real
cactus-produced HDF5 mouse/rat alignment — and
extract/tests/input/small.mmap1.0.hal.bz2 — a legacy mmap-format file).
Each test runs one of our CLI tools and diffs stdout/file output
byte-for-byte against the golden (reference paf/Makefile:20-31,
liftover/Makefile:32-70, maf/Makefile:40-56, synteny/Makefile:23-25).
"""

import bz2
import gzip
import io
import os
import subprocess
import sys

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def run_tool(args, stdout_path=None):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    res = subprocess.run(
        [sys.executable, "-m"] + args,
        cwd=REPO,
        env=env,
        capture_output=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr.decode()[-2000:]
    return res.stdout


@pytest.fixture(scope="module")
def small_mmap10(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixtures") / "small.mmap1.0.hal"
    with bz2.open(REF + "/extract/tests/input/small.mmap1.0.hal.bz2") as f:
        out.write_bytes(f.read())
    return str(out)


def _golden(path):
    if path.endswith(".gz"):
        with gzip.open(path) as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def test_hal2paf_small_mmap10(small_mmap10):
    """hal2paf --onlySequenceNames on the legacy mmap fixture
    (paf/Makefile:20-22)."""
    got = run_tool(["hal_tpu.tools.hal2paf", "--onlySequenceNames", small_mmap10])
    want = _golden(REF + "/paf/tests/expected/hal2pafSmallMMapTest.paf.gz")
    assert got == want


def test_hal2paf_mouse_rat():
    """hal2paf on the real cactus-produced mr.hal (paf/Makefile:24-26)."""
    got = run_tool(["hal_tpu.tools.hal2paf", REF + "/paf/tests/input/mr.hal"])
    want = _golden(REF + "/paf/tests/expected/hal2pafMouseRatTest.paf.gz")
    assert got == want


def test_validate_mouse_rat():
    """Our structural validation passes on the real reference HDF5 file."""
    got = run_tool(["hal_tpu.tools.halValidate", REF + "/paf/tests/input/mr.hal"])
    assert b"File valid" in got
