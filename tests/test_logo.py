"""Logo design tests — exercises the arbitrary-data path end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import designs
from designcsg_tpu.ops.interpreter import make_primary_sdf


@pytest.fixture(scope="module")
def logo():
    return designs.get_design("logo")


def test_structure(logo):
    # root + union group + 3 letters
    assert logo.num_objects == 5
    # three letters x (bitmask, numcurves, curvedata) chunks
    assert len(logo.ad_chunks) == 9
    assert logo.ad_offset("NUMCURVES_C") > 0
    # bitmask data is nonzero (letters have interiors)
    start, length = logo.ad_offset("LETTER_OFFS_S"), 265
    assert np.abs(np.asarray(logo.arrays.ad[start : start + length])).sum() > 0


def test_sdf_sign_structure(logo):
    sdf = make_primary_sdf(logo)
    pts = jnp.asarray(
        [
            [0.0, 0.0, 0.0],  # cube interior: far from all letter plates
            [20.0, 20.0, 20.0],  # far outside
        ],
        dtype=jnp.float32,
    )
    vals = np.asarray(sdf(pts, logo.arrays))
    assert vals[0] > 0  # letters are thin plates; center is outside them
    assert vals[1] > 1.0


def test_letters_exist_on_plates(logo):
    """Each letter plate must contain at least some negative (interior) SDF."""
    sdf = make_primary_sdf(logo)
    rng = np.random.default_rng(0)
    # letter C plate: local z = 1.25/2 in design units -> world, frame -Z.
    # Simpler: dense random sampling in the shell |v| in [2.5, 3.5]
    pts = rng.uniform(-3.6, 3.6, size=(20000, 3)).astype(np.float32)
    vals = np.asarray(sdf(jnp.asarray(pts), logo.arrays))
    assert (vals < 0).sum() > 10


def test_ad_is_differentiable(logo):
    """Curve control points live in the AD array; gradients must flow."""
    sdf = make_primary_sdf(logo)
    # pick sample points near a letter surface (where the curve-distance
    # branch, not the plate clip, is active)
    rng = np.random.default_rng(1)
    cand = jnp.asarray(
        rng.uniform(-3.6, 3.6, size=(20000, 3)).astype(np.float32)
    )
    vals = np.asarray(sdf(cand, logo.arrays))
    near = np.argsort(np.abs(vals))[:16]
    pts = cand[near]

    def loss(ad):
        return jnp.sum(sdf(pts, logo.arrays.replace(ad=ad)) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(logo.arrays.ad)))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
