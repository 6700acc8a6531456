"""Reusable prefab component library.

The reference ships an empty, user-editable ``designlibrary.py`` (second
editor tab, reference DesignCSG.cpp:403-420); this is its populated
equivalent: parametric prefab builders returning :class:`Component` trees
that any design can ``fabricate`` under its own transforms.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from designcsg_tpu import api
from designcsg_tpu.api import Transform


def _rounded_box_fn(v, ctx):
    """Box of half-extent 0.4 with corner radius 0.1 (unit-ish envelope)."""
    q = jnp.abs(v) - 0.4
    outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1))
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside - 0.1


def _torus_fn(v, ctx):
    """Torus in the xz-plane: major radius 0.35, minor 0.15."""
    ring = jnp.sqrt(v[..., 0] ** 2 + v[..., 2] ** 2) - 0.35
    return jnp.sqrt(ring**2 + v[..., 1] ** 2) - 0.15


# -- Pallas kernel twins + interval twins: the prefab library rides the TPU
# fast path (march/grid/point kernels) and the exact per-tile cull, same as
# the builtin brushes (reference: every user brush is in the generated
# sdf_bank dispatch, scenecompiler.py:489-511).
from designcsg_tpu.ops.pallas.brushes_kernel import register_kernel_brush
from designcsg_tpu.ops.pallas import cull as _cull


@register_kernel_brush(_rounded_box_fn)
def _rounded_box_kernel(x, y, z, ctx):
    qx = jnp.abs(x) - 0.4
    qy = jnp.abs(y) - 0.4
    qz = jnp.abs(z) - 0.4
    px = jnp.maximum(qx, 0.0)
    py = jnp.maximum(qy, 0.0)
    pz = jnp.maximum(qz, 0.0)
    outside = jnp.sqrt(px * px + py * py + pz * pz)
    inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
    return outside + inside - 0.1


@register_kernel_brush(_torus_fn)
def _torus_kernel(x, y, z, ctx):
    ring = jnp.sqrt(x * x + z * z) - 0.35
    return jnp.sqrt(ring * ring + y * y) - 0.15


@_cull.register_interval_brush(_rounded_box_fn)
def _rounded_box_iv(ia, ib, ic, ctx):
    c4 = _cull.iv_const(0.4)
    qx = _cull.iv_sub(_cull.iv_abs(ia), c4)
    qy = _cull.iv_sub(_cull.iv_abs(ib), c4)
    qz = _cull.iv_sub(_cull.iv_abs(ic), c4)
    zero = _cull.iv_const(0.0)
    px = _cull.iv_max(qx, zero)
    py = _cull.iv_max(qy, zero)
    pz = _cull.iv_max(qz, zero)
    outside = _cull.iv_norm3(px, py, pz)
    inside = _cull.iv_min(_cull.iv_max(qx, _cull.iv_max(qy, qz)), zero)
    return _cull.iv_sub(
        _cull.iv_add(outside, inside), _cull.iv_const(0.1)
    )


@_cull.register_interval_brush(_torus_fn)
def _torus_iv(ia, ib, ic, ctx):
    ring = _cull.iv_sub(
        _cull.iv_sqrt(_cull.iv_add(_cull.iv_square(ia), _cull.iv_square(ic))),
        _cull.iv_const(0.35),
    )
    return _cull.iv_sub(
        _cull.iv_sqrt(_cull.iv_add(_cull.iv_square(ring), _cull.iv_square(ib))),
        _cull.iv_const(0.15),
    )


def rounded_box(compiler=None, transform=None):
    c = compiler if compiler is not None else api.current()
    brush = c.define_brush(_rounded_box_fn, name="rounded_box")
    return api.Component(brush, transform=transform, compiler=c)


def torus(compiler=None, transform=None):
    c = compiler if compiler is not None else api.current()
    brush = c.define_brush(_torus_fn, name="torus")
    return api.Component(brush, transform=transform, compiler=c)


def capsule(A, B, thickness=1.0, compiler=None):
    """Capsule prefab between two points — the counter-scaled
    cylinder+spheres construction from the facade (DesignCSG.py:45-102),
    returned as a component instead of drawn."""
    from designcsg_tpu.api import _capsule_component

    cyl, pose = _capsule_component(np.asarray(A), np.asarray(B), thickness, compiler)
    return cyl.fabricate(transform=pose)


def ring_of(component, count, radius, compiler=None, axis="y"):
    """A group with `count` fabricated copies of `component` arranged on a
    circle — demonstrates prefab fabrication (scenecompiler.py:293-301)."""
    c = compiler if compiler is not None else api.current()
    group = api.Component(c.null_brush(), compiler=c)
    for k in range(count):
        angle = 2 * np.pi * k / count
        if axis == "y":
            pos = np.array([radius * np.cos(angle), 0.0, radius * np.sin(angle)])
            yaw = -angle
            pitch = 0.0
        else:
            pos = np.array([radius * np.cos(angle), radius * np.sin(angle), 0.0])
            yaw = 0.0
            pitch = angle
        group.add_child(
            component.fabricate(
                transform=Transform.initial(
                    position=pos, yaw=yaw, pitch=pitch, roll=0, scale=np.ones(3)
                )
            )
        )
    return group
