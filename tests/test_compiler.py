"""Scene-compiler golden tests.

The reference repo ships the compiled artifacts of Design2 (scene.txt /
buildprocedure.txt at /root/reference/master/) — the Design2 port must
reproduce them, byte-for-byte for the tape and to 1e-6 for the banks.
"""

import os

import numpy as np
import pytest

import designs
from designcsg_tpu import api
from designcsg_tpu.compiler import load_reference_scene

REF = "/root/reference/master"


@pytest.fixture
def design2_compiler():
    c = api.new_design()
    import designs.design2 as d2

    d2.build(compiler=c)
    return c


def test_design2_buildprocedure_matches_reference_golden(tmp_path, design2_compiler):
    design2_compiler.write_artifacts(str(tmp_path))
    ours = (tmp_path / "buildprocedure.txt").read_text().strip()
    theirs = open(os.path.join(REF, "buildprocedure.txt")).read().strip()
    assert ours == theirs


def test_design2_scene_txt_matches_reference_golden(tmp_path, design2_compiler):
    design2_compiler.write_artifacts(str(tmp_path))
    ours = (tmp_path / "scene.txt").read_text()
    theirs = open(os.path.join(REF, "scene.txt")).read()
    our_lines = ours.strip().splitlines()
    their_lines = theirs.strip().splitlines()
    assert len(our_lines) == len(their_lines)
    for ol, tl in zip(our_lines, their_lines):
        ovals = [float(x) for x in ol.split()]
        tvals = [float(x) for x in tl.split()]
        np.testing.assert_allclose(ovals, tvals, atol=1.5e-6)


def test_design2_scene_txt_exact_format(tmp_path, design2_compiler):
    """Formats should be identical strings (same float64 math, same %.6f)."""
    design2_compiler.write_artifacts(str(tmp_path))
    ours = (tmp_path / "scene.txt").read_text().strip()
    theirs = open(os.path.join(REF, "scene.txt")).read().strip()
    assert ours == theirs


def test_design1_structure():
    scene = designs.get_design("design1")
    # root + sphere + box + 8 corner spheres
    assert scene.num_objects == 11
    # tape: IMPORT root + 10 x (IMPORT + fold) with 8 subtractive needing
    # an extra NEGATE, + EXPORT
    assert scene.arrays.tape[-1][0] == 1  # EXPORT
    assert scene.num_build_steps == 1 + 2 * 2 + 3 * 8 + 1
    # registers: root + R0
    assert scene.num_registers == 2
    # brush banks: empty, space, sphere, cylinder, box, design sphere, box
    assert len(scene.brush_fns) == 7
    assert scene.arrays.shape_id[0] == 0  # root uses empty brush
    assert list(scene.arrays.shape_id[1:3]) == [5, 6]


def test_roundtrip_through_reference_format(tmp_path):
    import designs.design1 as d1

    c = api.new_design()
    d1.build(compiler=c)
    compiled = c.write_artifacts(str(tmp_path))
    loaded = load_reference_scene(
        str(tmp_path / "scene.txt"),
        str(tmp_path / "buildprocedure.txt"),
        brush_fns=compiled.brush_fns,
        arbitrary_data_path=str(tmp_path / "arbitrary_data.hex"),
        export_config_path=str(tmp_path / "exportConfig.txt"),
    )
    np.testing.assert_array_equal(loaded.arrays.tape, compiled.arrays.tape)
    np.testing.assert_allclose(
        loaded.arrays.position, compiled.arrays.position, atol=1e-6
    )
    np.testing.assert_allclose(loaded.arrays.right, compiled.arrays.right, atol=1e-6)
    np.testing.assert_array_equal(loaded.arrays.shape_id, compiled.arrays.shape_id)
    assert loaded.num_registers >= compiled.num_registers
    assert loaded.export_config.grid_level == 8


def test_export_config_world_scale():
    c = api.new_design()
    c.set_export_config(boundingBoxHalfDiameter=2.0)
    # Reference writes 5 * halfDiameter (DesignCSG.py:225)
    assert c.export_config.bounding_box_half_diameter == pytest.approx(10.0)


def test_intersection_component_tape():
    """drawIntersection folds children with MAX over the space brush."""
    c = api.new_design()
    s1 = api.Component(api.sphere_brush(c), compiler=c)
    s2 = api.Component(api.box_brush(c), compiler=c)
    api.drawIntersection(s1, s2, compiler=c)
    scene = c.commit()
    tape = [tuple(int(v) for v in row) for row in scene.arrays.tape]
    # root IMPORT, intersection IMPORT(space=1), 2x(IMPORT+MAX), MIN fold, EXPORT
    opcodes = [t[0] for t in tape]
    assert opcodes == [0, 0, 0, 3, 0, 3, 2, 1]
    assert tape[1][1] == 1  # space brush bank index
