"""Prefab library + golden-image regression tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import designs
from designcsg_tpu import api
from designcsg_tpu.api import Transform
from designcsg_tpu.config import RenderConfig
from designcsg_tpu.ops.interpreter import make_primary_sdf
from designcsg_tpu.ops.raymarch import render_scene, to_u8

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def test_prefab_ring_of_toruses():
    from designs.library import ring_of, torus

    c = api.new_design()
    ring = ring_of(torus(compiler=c), count=6, radius=1.5, compiler=c)
    c.root.add_child(ring)
    scene = c.commit()
    # 1 root + 1 group + 6 fabricated toruses
    assert scene.num_objects == 8
    sdf = make_primary_sdf(scene)
    # a point on the first torus's tube (major radius 0.35 from its center
    # at design (1.5, 0, 0); world = 5x design)
    p = jnp.asarray([[5 * (1.5 + 0.35), 0.0, 0.0]], dtype=jnp.float32)
    assert float(sdf(p, scene.arrays)[0]) < 0.0


def test_prefab_capsule():
    from designs.library import capsule

    c = api.new_design()
    comp = capsule([0.0, -1.0, 0.0], [0.0, 1.0, 0.0], thickness=0.5, compiler=c)
    c.root.add_child(comp)
    scene = c.commit()
    sdf = make_primary_sdf(scene)
    inside = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 5.0, 0.0]], dtype=jnp.float32)
    vals = np.asarray(sdf(inside, scene.arrays))
    assert vals[0] < 0  # middle of the capsule
    assert vals[1] < 0  # sphere cap at the end (design y=1 -> world y=5)


@pytest.mark.parametrize("name", ["design1", "design2"])
def test_golden_render_regression(name):
    """Byte-stable u8 renders at 160x120 — catches semantic drift in the
    full render stack.  Regenerate with tests/make_goldens.py after an
    intentional change."""
    scene = designs.get_design(name)
    config = RenderConfig(width=160, height=120)
    img = np.asarray(to_u8(render_scene(scene, config=config)))
    path = os.path.join(GOLDEN_DIR, f"{name}_160x120.npy")
    if not os.path.exists(path):
        pytest.skip("golden missing; run tests/make_goldens.py")
    golden = np.load(path)
    # Allow a handful of boundary pixels to flip by compiler reassociation.
    diff = np.abs(img.astype(int) - golden.astype(int))
    frac_off = (diff.max(axis=-1) > 2).mean()
    assert frac_off < 0.002, f"{frac_off:.4%} pixels differ"
