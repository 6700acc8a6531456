"""Cross-validation of the generated 256-case CMS table against the
reference's committed lookupTable.txt.

The reference ships the table as data (/root/reference/master/lookupTable.txt,
parsed by readLookupTable.hpp:32-76); ours is *generated* from per-face
marching squares (ops/marching_cubes.py).  The two use different corner/edge
numbering: the reference's corners come from Box3f::getCorners
(geometry.hpp:264-279 — bottom ring 0-3 at y=-1 winding through z, top ring
4-7, verticals i->i+4, edges mesh.hpp:185-209); ours is c = x + 2y + 4z with
axis-grouped edges.  This test maps the reference table into our numbering
and asserts exact agreement for every configuration — cut-edge sets AND
cycle partitions, i.e. our ambiguous-face resolution reproduces the
reference's topology choices exactly.
"""

import os

import pytest

from designcsg_tpu.ops.marching_cubes import EDGES, _cycles_for_config

_REF_TABLE = "/root/reference/master/lookupTable.txt"

# Reference corner i -> our corner index (map (-1,+1) coords to (0,1)):
# ref order: (-1,-1,+1),(+1,-1,+1),(+1,-1,-1),(-1,-1,-1),
#            (-1,+1,+1),(+1,+1,+1),(+1,+1,-1),(-1,+1,-1)
R2O = [4, 5, 1, 0, 6, 7, 3, 2]
# Reference edges as reference-corner pairs (mesh.hpp:185-209).
REF_PAIRS = [
    (0, 1), (1, 2), (2, 3), (3, 0),  # bottom ring
    (4, 5), (5, 6), (6, 7), (7, 4),  # top ring
    (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
]


def _edge_map():
    our_index = {tuple(sorted(e)): i for i, e in enumerate(map(tuple, EDGES))}
    return [our_index[tuple(sorted((R2O[a], R2O[b])))] for a, b in REF_PAIRS]


@pytest.mark.skipif(not os.path.exists(_REF_TABLE), reason="reference absent")
def test_generated_table_matches_reference_lookup_table():
    ref2ours = _edge_map()
    lines = open(_REF_TABLE).read().split("\n")
    assert len(lines) >= 256
    for cfg in range(256):
        line = lines[cfg].strip()
        cycles_ref = []
        if line:
            for part in line.split(";"):
                part = part.strip()
                if not part:
                    continue
                cycles_ref.append(
                    [ref2ours[int(tok)] for tok in part.split(",") if tok.strip()]
                )
        ourcfg = 0
        for i in range(8):
            if (cfg >> i) & 1:
                ourcfg |= 1 << R2O[i]
        cycles_ours = _cycles_for_config(ourcfg)
        # Same cut edges (determined by corner signs alone) ...
        assert sorted(e for c in cycles_ref for e in c) == sorted(
            e for c in cycles_ours for e in c
        ), cfg
        # ... and the same cycle partition: the ambiguous-face rule agrees
        # with the reference's committed topology for every config.
        assert sorted(sorted(c) for c in cycles_ref) == sorted(
            sorted(c) for c in cycles_ours
        ), cfg
