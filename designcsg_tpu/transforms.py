"""Homogeneous transform algebra.

Reproduces the reference's (idiosyncratic) conventions exactly so compiled
scenes are bit-comparable (reference: /root/reference/master/scenecompiler.py:42-143):

* Euler matrices are written down row-wise and then transposed, i.e. the listed
  rows become *columns* of the returned matrix.
* ``rotation(yaw, pitch, roll) = eulerY(yaw) @ eulerX(pitch) @ eulerZ(roll)``.
* ``initial = translation @ rotation @ scaling``.
* ``axes(v1, v2, v3)`` puts v1/v2/v3 in the matrix *columns*.
* ``reciprocal_vector(v) = v / ||v||**2`` — the trick that lets a non-uniform
  scale+rotation frame be inverted row-by-row without a matrix inverse.

Every function is backend-agnostic: pass ``xp=numpy`` (default, float64 — used
by the scene compiler so emitted artifacts match the reference's float64
pipeline) or ``xp=jax.numpy`` for traced/differentiable use (the fit harness
re-derives object banks from pose parameters under jit).
"""

from __future__ import annotations

import numpy as np

_HALF_PI = np.pi / 2.0


def homogenize(v, xp=np):
    v = xp.asarray(v)
    return xp.concatenate([v[:3], xp.zeros((1,), dtype=v.dtype)])


def to_homogenous(v, xp=np):
    v = xp.asarray(v)
    return xp.concatenate([v, xp.ones((1,), dtype=v.dtype)])


def from_homogenous(v):
    return v[0:3]


def reciprocal_vector(v, xp=np):
    """v / ||v||^2 (scenecompiler.py:77-80)."""
    v = xp.asarray(v)
    return v / xp.sum(v * v)


def normalized(v, xp=np):
    v = xp.asarray(v)
    return v / xp.sqrt(xp.sum(v * v))


def axes(v1, v2, v3, xp=np):
    """Direct frame: v1/v2/v3 become the columns (scenecompiler.py:53-56)."""
    v1 = xp.asarray(v1) * 1.0
    r = xp.stack(
        [
            homogenize(v1, xp),
            homogenize(xp.asarray(v2) * 1.0, xp),
            homogenize(xp.asarray(v3) * 1.0, xp),
            xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=v1.dtype),
        ]
    )
    return r.T


def identity(xp=np):
    return axes(
        xp.asarray([1.0, 0.0, 0.0]),
        xp.asarray([0.0, 1.0, 0.0]),
        xp.asarray([0.0, 0.0, 1.0]),
        xp,
    )


def translation(offset, xp=np):
    offset = xp.asarray(offset, dtype=xp.float64 if xp is np else None)
    eye = xp.eye(4, dtype=offset.dtype)
    if xp is np:
        out = eye.copy()
        out[0:3, 3] = offset
        return out
    return eye.at[0:3, 3].set(offset)


def eulerY(yaw, xp=np):
    """scenecompiler.py:83-91 — rows listed, then transposed."""
    c, s = xp.cos(-yaw), xp.sin(-yaw)
    c2, s2 = xp.cos(-yaw + _HALF_PI), xp.sin(-yaw + _HALF_PI)
    zero = xp.zeros_like(c)
    one = xp.ones_like(c)
    rows = xp.stack(
        [
            xp.stack([c, zero, s, zero]),
            xp.stack([zero, one, zero, zero]),
            xp.stack([c2, zero, s2, zero]),
            xp.stack([zero, zero, zero, one]),
        ]
    )
    return rows.T


def eulerX(pitch, xp=np):
    """scenecompiler.py:94-103."""
    s1, c1 = xp.sin(pitch + _HALF_PI), xp.cos(pitch + _HALF_PI)
    s2, c2 = xp.sin(pitch), xp.cos(pitch)
    zero = xp.zeros_like(s1)
    one = xp.ones_like(s1)
    rows = xp.stack(
        [
            xp.stack([one, zero, zero, zero]),
            xp.stack([zero, s1, c1, zero]),
            xp.stack([zero, s2, c2, zero]),
            xp.stack([zero, zero, zero, one]),
        ]
    )
    return rows.T


def eulerZ(roll, xp=np):
    """scenecompiler.py:105-114."""
    c1, s1 = xp.cos(roll), xp.sin(roll)
    c2, s2 = xp.cos(roll + _HALF_PI), xp.sin(roll + _HALF_PI)
    zero = xp.zeros_like(c1)
    one = xp.ones_like(c1)
    rows = xp.stack(
        [
            xp.stack([c1, s1, zero, zero]),
            xp.stack([c2, s2, zero, zero]),
            xp.stack([zero, zero, one, zero]),
            xp.stack([zero, zero, zero, one]),
        ]
    )
    return rows.T


def scaling(scale, xp=np):
    """Diagonal scale (scenecompiler.py:116-125; transpose is a no-op).

    Accepts a 3-vector like the reference, or a scalar (uniform scale)."""
    scale = xp.asarray(scale)
    if scale.ndim == 0:
        scale = xp.broadcast_to(scale, (3,))
    s4 = xp.concatenate([scale, xp.ones((1,), dtype=scale.dtype)])
    return xp.diag(s4)


def rotation(yaw, pitch, roll, xp=np):
    """Y * X * Z composition (scenecompiler.py:129-130)."""
    return eulerY(yaw, xp) @ eulerX(pitch, xp) @ eulerZ(roll, xp)


def initial(position, yaw, pitch, roll, scale, xp=np):
    """T * R * S (scenecompiler.py:133-135)."""
    return translation(position, xp) @ rotation(yaw, pitch, roll, xp) @ scaling(scale, xp)


class Transform:
    """Namespace mirroring the reference's ``Transform`` static class API."""

    homogenize = staticmethod(homogenize)
    to_homogenous = staticmethod(to_homogenous)
    from_homogenous = staticmethod(from_homogenous)
    reciprocal_vector = staticmethod(reciprocal_vector)
    normalized = staticmethod(normalized)
    axes = staticmethod(axes)
    identity = staticmethod(identity)
    translation = staticmethod(translation)
    eulerX = staticmethod(eulerX)
    eulerY = staticmethod(eulerY)
    eulerZ = staticmethod(eulerZ)
    scaling = staticmethod(scaling)
    rotation = staticmethod(rotation)
    initial = staticmethod(initial)
