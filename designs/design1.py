"""Design1 — sphere union box minus eight corner spheres.

Port of the canonical reference test model
(reference: /root/reference/master/Designs/Design1.py).  The design script
defines its own sphere/box brushes (landing at bank indices 5 and 6, after the
facade's builtin 0-4) exactly as the reference does, so compiled artifacts are
comparable line-for-line.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from designcsg_tpu import api
from designcsg_tpu.api import Transform


def _sphere_fn(v, ctx):
    """return length(v)-0.5;"""
    return jnp.sqrt(jnp.sum(v * v, axis=-1)) - 0.5


def _box_fn(v, ctx):
    """v = fabs(v); return T_max(T_max(v.x-0.5, v.y-0.5), v.z-0.5);"""
    v = jnp.abs(v)
    return jnp.maximum(jnp.maximum(v[..., 0] - 0.5, v[..., 1] - 0.5), v[..., 2] - 0.5)


from designcsg_tpu.ops.pallas.brushes_kernel import register_kernel_brush


@register_kernel_brush(_sphere_fn)
def _sphere_kernel(a, b, c, ctx):
    return jnp.sqrt(a * a + b * b + c * c) - 0.5


@register_kernel_brush(_box_fn)
def _box_kernel(a, b, c, ctx):
    return jnp.maximum(
        jnp.abs(a) - 0.5, jnp.maximum(jnp.abs(b) - 0.5, jnp.abs(c) - 0.5)
    )


# Interval twins (exact per-tile cull, ops/pallas/cull.py): same formulas
# over scalar intervals.
from designcsg_tpu.ops.pallas import cull as _cull


@_cull.register_interval_brush(_sphere_fn)
def _sphere_iv(ia, ib, ic, ctx):
    return _cull.iv_sub(_cull.iv_norm3(ia, ib, ic), _cull.iv_const(0.5))


@_cull.register_interval_brush(_box_fn)
def _box_iv(ia, ib, ic, ctx):
    return _cull.iv_sub(
        _cull.iv_max(
            _cull.iv_abs(ia), _cull.iv_max(_cull.iv_abs(ib), _cull.iv_abs(ic))
        ),
        _cull.iv_const(0.5),
    )


def build(compiler=None):
    c = api.new_design() if compiler is None else compiler
    PI = np.pi

    sphere_brush = c.define_brush(_sphere_fn, name="design1_sphere")
    box_brush = c.define_brush(_box_fn, name="design1_box")

    api.draw(
        sphere_brush,
        Transform.initial(
            position=np.array([0.0, -0.0, 0.0]),
            yaw=-PI / 2,
            pitch=0,
            roll=0,
            scale=np.array([1.25, 1.25, 1.25]),
        ),
        compiler=c,
    )
    api.draw(
        box_brush,
        Transform.initial(
            position=np.array([0.0, -0.0, 0.0]),
            yaw=-PI / 2,
            pitch=0,
            roll=0,
            scale=np.array([0.95, 0.95, 0.95]),
        ),
        compiler=c,
    )
    for _x, _y, _z in np.ndindex((3, 3, 3)):
        x, y, z = _x - 1, _y - 1, _z - 1
        if abs(x) + abs(y) + abs(z) == 3:
            api.erase(
                sphere_brush,
                Transform.initial(
                    position=np.array([x, y, z], dtype=np.float64),
                    yaw=-PI / 2,
                    pitch=0,
                    roll=0,
                    scale=2.15 * np.ones(3),
                ),
                compiler=c,
            )

    c.set_export_config(
        boundingBoxHalfDiameter=2.0,
        minimumOctreeLevel=5,
        maximumOctreeLevel=7,
        gridLevel=8,
        complexSurfaceThreshold=np.pi / 2.0 * 0.5,
        gradientDescentSteps=50,
        cacheSubdivision=16,
        queriesBeforeGC=512,
        queriesBeforeFree=4096,
    )
    return c.commit()
