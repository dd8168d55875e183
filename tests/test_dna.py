import numpy as np

from hal_tpu import dna


def test_pack_unpack_roundtrip():
    s = b"ACGTacgtNnACG"
    p = dna.pack_dna(s)
    assert len(p) == (len(s) + 1) // 2
    out = dna.unpack_dna(p, 0, len(s))
    assert out.tobytes() == s


def test_unpack_offsets():
    s = b"ACGTACGTA"
    p = dna.pack_dna(s)
    for start in range(len(s)):
        for length in range(len(s) - start + 1):
            assert dna.unpack_dna(p, start, length).tobytes() == s[start : start + length]


def test_write_dna_partial():
    base = b"aaaaaaaaaa"
    p = dna.pack_dna(base)
    dna.write_dna(p, 3, b"CGT")
    assert dna.unpack_dna(p, 0, 10).tobytes() == b"aaaCGTaaaa"
    dna.write_dna(p, 0, b"T")
    assert dna.unpack_dna(p, 0, 10).tobytes() == b"TaaCGTaaaa"
    dna.write_dna(p, 9, b"g")
    assert dna.unpack_dna(p, 0, 10).tobytes() == b"TaaCGTaaag"


def test_reverse_complement():
    assert dna.reverse_complement(b"ACGTn").tobytes() == b"nACGT"
    assert dna.reverse_complement(b"acgt").tobytes() == b"acgt"[::-1].translate(
        bytes.maketrans(b"acgt", b"tgca")
    )


def test_nibble_layout_matches_reference():
    # even position in high nibble; codes 0..4 acgtn, 8..12 ACGTN
    # (reference api/inc/halCommon.h:183-196)
    p = dna.pack_dna(b"aC")
    assert p[0] == (0 << 4) | (8 + 1)
    p = dna.pack_dna(b"Ng")
    assert p[0] == (12 << 4) | 2
