"""Brushes and materials as JAX functions.

The reference stores brushes/materials as OpenCL source strings compiled into
``sdf_bank``/``shader_bank`` switch dispatchers at scene build time
(reference: /root/reference/master/scenecompiler.py:227-258,489-511).  Here a
brush is an ordinary JAX-traceable function — XLA fuses, vectorizes and
differentiates it; no string codegen exists.  The reference's
``define_auxillary_function`` / ``add_preprocessor_define`` capabilities are
subsumed by plain Python.

Brush signature::

    def my_brush(v: f32[..., 3], ctx: EvalContext) -> f32[...]

``v`` is the point in the brush's local (unit) frame; the returned value is the
signed distance.  ``ctx.ad`` is the arbitrary-data array (the reference's
``getAD`` path, k1.cl:29) and is differentiable.

Material signature::

    def my_material(gv: f32[..., 3], lv: f32[..., 3], n: f32[..., 3],
                    ctx: EvalContext) -> f32[..., 3]

``gv`` = global hit point, ``lv`` = hit point in the attributed object's local
frame, ``n`` = surface normal; returns linear RGB.  ``ctx.rgt/upp/fwd`` expose
the camera frame (the reference's ``rgt_g/upp_g/fwd_g`` globals, k1.cl:35-37).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp

from .constants import MAX_DISTANCE


@dataclasses.dataclass
class EvalContext:
    """Runtime context handed to brush/material functions.

    All fields are JAX-traceable (differentiable) arrays.
    """

    ad: Any = None  # arbitrary data, f32[ARBITRARY_DATA_POINTS]
    rgt: Any = None  # camera frame (materials only), f32[3]
    upp: Any = None
    fwd: Any = None
    #: Kernel-side prelude arrays (dict name -> VMEM ref/array): per-scene
    #: data a brush's kernel twin precomputes from the scene arrays outside
    #: the kernel (ops/pallas/brushes_kernel.py: __kernel_prelude__).
    extras: Any = None


@dataclasses.dataclass(frozen=True)
class Brush:
    """A signed-distance function plus its bank index."""

    fn: Callable[..., Any]
    bank_index: int
    name: str = ""

    def __call__(self, v, ctx: Optional[EvalContext] = None):
        return self.fn(v, ctx if ctx is not None else EvalContext())


@dataclasses.dataclass(frozen=True)
class Material:
    """A shader function plus its bank index."""

    fn: Callable[..., Any]
    bank_index: int
    name: str = ""

    def __call__(self, gv, lv, n, ctx: Optional[EvalContext] = None):
        return self.fn(gv, lv, n, ctx if ctx is not None else EvalContext())


# ---------------------------------------------------------------------------
# Builtin brushes.
# The scene compiler pre-registers empty (bank 0) and space (bank 1)
# (scenecompiler.py:424-425); the API facade registers sphere/cylinder/box
# (banks 2-4, DesignCSG.py:9-22).
# ---------------------------------------------------------------------------


def empty_brush_fn(v, ctx):
    """MIN-identity used for group/root nodes ("return MAX_DISTANCE;")."""
    return jnp.full(v.shape[:-1], MAX_DISTANCE, dtype=v.dtype)


def space_brush_fn(v, ctx):
    """MAX-identity used by intersections ("return 0.0;")."""
    return jnp.zeros(v.shape[:-1], dtype=v.dtype)


def sphere_brush_fn(v, ctx):
    """Unit sphere of radius 0.5 ("return length(v)-0.5;", DesignCSG.py:9)."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1)) - 0.5


def cylinder_brush_fn(v, ctx):
    """Y-axis unit cylinder (DesignCSG.py:10-17)."""
    v = jnp.abs(v)
    x = jnp.sqrt(v[..., 0] ** 2 + v[..., 2] ** 2)
    y = v[..., 1]
    return jnp.maximum(x - 0.5, y - 0.5)


def box_brush_fn(v, ctx):
    """Unit box (Chebyshev-distance form, DesignCSG.py:19-22)."""
    v = jnp.abs(v)
    return jnp.maximum(v[..., 0] - 0.5, jnp.maximum(v[..., 1] - 0.5, v[..., 2] - 0.5))


# ---------------------------------------------------------------------------
# Builtin materials (scenecompiler.py:426-435): abs_normals (bank 0) and
# basic_lighting (bank 1, the default material).
# ---------------------------------------------------------------------------


def abs_normals_fn(gv, lv, n, ctx):
    """"return fabs(n);" — local-frame normal visualisation."""
    return jnp.abs(n)


def basic_lighting_fn(gv, lv, n, ctx):
    """Headlamp shading: rotate the local normal into the global (camera)
    frame, then L = dot(n_g, (0,0,-1)) (scenecompiler.py:427-435)."""
    n_g = (
        n[..., 0:1] * ctx.rgt
        + n[..., 1:2] * ctx.upp
        + n[..., 2:3] * ctx.fwd
    )
    light = -n_g[..., 2]
    return jnp.stack([light, light, light], axis=-1)
