"""Transform-algebra unit tests.

The reciprocal-frame invariant is the load-bearing property: for any
T*R*S transform, local coordinates recovered via the reciprocal frame rows
must equal the original local coordinates (this is what makes the IMPORT
op's 3-dot-product frame transform a correct inverse without a matrix
inverse; reference scenecompiler.py:77-80,533-543).
"""

import numpy as np
import pytest

from designcsg_tpu import transforms as tf


def test_identity():
    np.testing.assert_allclose(tf.identity(), np.eye(4))


def test_euler_zero_is_identity():
    np.testing.assert_allclose(tf.eulerY(0.0), np.eye(4), atol=1e-12)
    np.testing.assert_allclose(tf.eulerX(0.0), np.eye(4), atol=1e-12)
    np.testing.assert_allclose(tf.eulerZ(0.0), np.eye(4), atol=1e-12)


def test_euler_matrices_are_rotations():
    for fn in (tf.eulerX, tf.eulerY, tf.eulerZ):
        for angle in (0.3, -1.2, 2.9):
            m = fn(angle)[0:3, 0:3]
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
            assert np.linalg.det(m) == pytest.approx(1.0)


def test_eulerY_rotates_x_toward_minus_z():
    """Reference convention: columns come from the transposed construction.
    eulerY(yaw) column 0 is (cos(-yaw), 0, sin(-yaw))."""
    yaw = 0.7
    m = tf.eulerY(yaw)
    np.testing.assert_allclose(
        m[0:3, 0], [np.cos(-yaw), 0.0, np.sin(-yaw)], atol=1e-12
    )


def test_axes_columns():
    m = tf.axes([1, 2, 3], [4, 5, 6], [7, 8, 9])
    np.testing.assert_allclose(m[0:3, 0], [1, 2, 3])
    np.testing.assert_allclose(m[0:3, 1], [4, 5, 6])
    np.testing.assert_allclose(m[0:3, 2], [7, 8, 9])
    np.testing.assert_allclose(m[3], [0, 0, 0, 1])


def test_initial_composition():
    pos = np.array([1.0, -2.0, 3.0])
    m = tf.initial(pos, 0.4, -0.2, 0.9, np.array([2.0, 3.0, 0.5]))
    expected = (
        tf.translation(pos)
        @ tf.eulerY(0.4)
        @ tf.eulerX(-0.2)
        @ tf.eulerZ(0.9)
        @ tf.scaling(np.array([2.0, 3.0, 0.5]))
    )
    np.testing.assert_allclose(m, expected)
    np.testing.assert_allclose(m[0:3, 3], pos)


def test_reciprocal_vector():
    v = np.array([3.0, 0.0, 4.0])
    np.testing.assert_allclose(tf.reciprocal_vector(v), v / 25.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_reciprocal_frame_inverts_trs(seed):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=3)
    yaw, pitch, roll = rng.uniform(-np.pi, np.pi, size=3)
    scale = rng.uniform(0.2, 3.0, size=3)
    m = tf.initial(pos, yaw, pitch, roll, scale)

    p_local = rng.normal(size=3)
    p_world = (m @ np.concatenate([p_local, [1.0]]))[:3]

    cols = [m[0:3, 0], m[0:3, 1], m[0:3, 2]]
    recovered = np.array(
        [np.dot(p_world - m[0:3, 3], tf.reciprocal_vector(c)) for c in cols]
    )
    np.testing.assert_allclose(recovered, p_local, atol=1e-10)


def test_jax_backend_matches_numpy():
    import jax.numpy as jnp

    pos = np.array([0.5, 1.5, -0.25])
    args = (pos, 0.3, -0.7, 1.1, np.array([1.0, 2.0, 0.5]))
    m_np = tf.initial(*args)
    m_jnp = tf.initial(*[jnp.asarray(a) for a in args[:1]] + list(args[1:]), xp=jnp)
    np.testing.assert_allclose(np.asarray(m_jnp), m_np, atol=1e-6)
