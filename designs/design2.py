"""Design2 — level-2 Hilbert-curve sculpture on a turned base.

Port of the reference's most complex example
(reference: /root/reference/master/Designs/Design2.py).  The reference builds
this brush out of OpenCL preprocessor defines, a ``__constant`` table of 27
quadrant rotation matrices and a recursive-looking cell evaluator; here it is
ordinary Python + jnp: the 8 occupied corner quadrants unroll at trace time
and the per-quadrant matrices are a closed-over numpy table.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from designcsg_tpu import api
from designcsg_tpu.api import Transform
from designcsg_tpu.constants import MAX_DISTANCE

LINE_WIDTH = 0.1

# Quadrant rotation matrices (row-major 3x3 per corner), indexed by
# (x+1)*9 + (y+1)*3 + (z+1).  Only the 8 corners with |x|+|y|+|z| == 3 are
# ever used; all other entries are identity.
_QUADRANT_MATRICES = np.tile(np.eye(3), (27, 1, 1))


def _set_quadrant(x, y, z, rows):
    _QUADRANT_MATRICES[(x + 1) * 9 + (y + 1) * 3 + (z + 1)] = np.asarray(rows, float)


_set_quadrant(-1, -1, -1, [[0, 1, 0], [0, 0, 1], [1, 0, 0]])
_set_quadrant(-1, -1, +1, [[1, 0, 0], [0, -1, 0], [0, 0, -1]])
_set_quadrant(-1, +1, -1, [[0, 0, 1], [1, 0, 0], [0, 1, 0]])
_set_quadrant(-1, +1, +1, [[0, 0, 1], [1, 0, 0], [0, 1, 0]])
_set_quadrant(+1, -1, -1, [[0, 1, 0], [0, 0, 1], [-1, 0, 0]])
_set_quadrant(+1, -1, +1, [[-1, 0, 0], [0, -1, 0], [0, 0, -1]])
_set_quadrant(+1, +1, -1, [[0, 0, -1], [-1, 0, 0], [0, 1, 0]])
_set_quadrant(+1, +1, +1, [[0, 0, -1], [-1, 0, 0], [0, 1, 0]])

DIRECTION_X, DIRECTION_Y, DIRECTION_Z = 0, 1, 2


def _box(point, center, half_diameter):
    """Chebyshev box: max component of |p - c| - h."""
    q = jnp.abs(point - jnp.asarray(center, dtype=point.dtype)) - jnp.asarray(
        half_diameter, dtype=point.dtype
    )
    return jnp.max(q, axis=-1)


def _hilbert_unit_cell_raw(v):
    w = LINE_WIDTH
    ds = [
        _box(v, [-0.5, -0.5, 0.0], [w, w, 0.5 + w]),
        _box(v, [0.5, -0.5, 0.0], [w, w, 0.5 + w]),
        _box(v, [0.0, -0.5, -0.5], [0.5 + w, w, w]),
        _box(v, [-0.5, 0.5, 0.0], [w, w, 0.5 + w]),
        _box(v, [0.5, 0.5, 0.0], [w, w, 0.5 + w]),
        _box(v, [0.0, 0.5, -0.5], [0.5 + w, w, w]),
        _box(v, [0.5, 0.0, 0.5], [w, 0.5 + w, w]),
    ]
    out = ds[0]
    for d in ds[1:]:
        out = jnp.minimum(out, d)
    return out


def _hilbert_unit_cell(v):
    # v = termProduct(swizzle(v,1,0,2), (1,-1,1)); then swizzle(v,2,1,0)*(1,1,-1)
    v = jnp.stack([v[..., 1], -v[..., 0], v[..., 2]], axis=-1)
    v = jnp.stack([v[..., 2], v[..., 1], -v[..., 0]], axis=-1)
    return _hilbert_unit_cell_raw(v)


def _put_hilbert(v, x, y, z):
    c = jnp.asarray([x / 3.0, y / 3.0, z / 3.0], dtype=v.dtype)
    w = 3.0 * (v - c)
    m = _QUADRANT_MATRICES[(x + 1) * 9 + (y + 1) * 3 + (z + 1)]
    local = jnp.einsum("rc,...c->...r", jnp.asarray(m, dtype=v.dtype), w)
    return _hilbert_unit_cell(local)


def _put_shaft(v, half_width, half_length, direction):
    half = [half_width] * 3
    half[direction] = half_length + half_width
    return _box(v, [0.0, 0.0, 0.0], half)


def _put_connector(v, large_i, large_j, large_k, i, j, k, direction):
    center = jnp.asarray(
        [
            (large_i + i / 2.0) / 3.0,
            (large_j + j / 2.0) / 3.0,
            (large_k + k / 2.0) / 3.0,
        ],
        dtype=v.dtype,
    )
    return _put_shaft(3.0 * (v - center), LINE_WIDTH, 0.5, direction)


def _put_connectors(v):
    d = jnp.full(v.shape[:-1], MAX_DISTANCE, dtype=v.dtype)
    specs = [
        (0, -1, 1, 0, 1, 1, DIRECTION_X),
        (1, 0, -1, 1, 0, -1, DIRECTION_Y),
        (-1, 0, -1, -1, 0, -1, DIRECTION_Y),
        (1, 0, 1, 1, 0, 1, DIRECTION_Y),
        (-1, 0, 1, -1, 0, 1, DIRECTION_Y),
        (1, 1, 0, 1, -1, 0, DIRECTION_Z),
        (-1, 1, 0, -1, -1, 0, DIRECTION_Z),
    ]
    for spec in specs:
        d = jnp.minimum(d, _put_connector(v, *spec))
    return d


def hilbert_sdf(v):
    m = jnp.full(v.shape[:-1], MAX_DISTANCE, dtype=v.dtype)
    for i in (-1, 1):
        for j in (-1, 1):
            for k in (-1, 1):
                m = jnp.minimum(m, _put_hilbert(v, i, j, k))
    return jnp.minimum(m, _put_connectors(v))


def _hilbert_brush_fn(v, ctx):
    return hilbert_sdf(v)


def _base_brush_fn(v, ctx):
    outer, inner, height = 0.5, 0.45, 0.05
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    r = jnp.sqrt(x * x + z * z)
    new_radius = inner + (outer - inner) * (1.0 - y / height)
    d = jnp.where(y > 0, r - new_radius, r - outer)
    return jnp.maximum(d, jnp.abs(y) - height)


from designcsg_tpu.ops.pallas.brushes_kernel import register_kernel_brush


def _box3(x, y, z, cx, cy, cz, hx, hy, hz):
    qx = jnp.abs(x - cx) - hx
    qy = jnp.abs(y - cy) - hy
    qz = jnp.abs(z - cz) - hz
    return jnp.maximum(qx, jnp.maximum(qy, qz))


def _cell_raw3(x, y, z):
    w = LINE_WIDTH
    d = _box3(x, y, z, -0.5, -0.5, 0.0, w, w, 0.5 + w)
    d = jnp.minimum(d, _box3(x, y, z, 0.5, -0.5, 0.0, w, w, 0.5 + w))
    d = jnp.minimum(d, _box3(x, y, z, 0.0, -0.5, -0.5, 0.5 + w, w, w))
    d = jnp.minimum(d, _box3(x, y, z, -0.5, 0.5, 0.0, w, w, 0.5 + w))
    d = jnp.minimum(d, _box3(x, y, z, 0.5, 0.5, 0.0, w, w, 0.5 + w))
    d = jnp.minimum(d, _box3(x, y, z, 0.0, 0.5, -0.5, 0.5 + w, w, w))
    d = jnp.minimum(d, _box3(x, y, z, 0.5, 0.0, 0.5, w, 0.5 + w, w))
    return d


@register_kernel_brush(_hilbert_brush_fn)
def _hilbert_kernel(x, y, z, ctx):
    m = jnp.full_like(x, MAX_DISTANCE)
    for i in (-1, 1):
        for j in (-1, 1):
            for k in (-1, 1):
                q = _QUADRANT_MATRICES[(i + 1) * 9 + (j + 1) * 3 + (k + 1)]
                wx = 3.0 * (x - i / 3.0)
                wy = 3.0 * (y - j / 3.0)
                wz = 3.0 * (z - k / 3.0)
                a = q[0, 0] * wx + q[0, 1] * wy + q[0, 2] * wz
                b = q[1, 0] * wx + q[1, 1] * wy + q[1, 2] * wz
                c = q[2, 0] * wx + q[2, 1] * wy + q[2, 2] * wz
                # the two swizzles compose to (a,b,c) -> (c, -a, -b)
                m = jnp.minimum(m, _cell_raw3(c, -a, -b))
    # connectors
    specs = [
        (0, -1, 1, 0, 1, 1, DIRECTION_X),
        (1, 0, -1, 1, 0, -1, DIRECTION_Y),
        (-1, 0, -1, -1, 0, -1, DIRECTION_Y),
        (1, 0, 1, 1, 0, 1, DIRECTION_Y),
        (-1, 0, 1, -1, 0, 1, DIRECTION_Y),
        (1, 1, 0, 1, -1, 0, DIRECTION_Z),
        (-1, 1, 0, -1, -1, 0, DIRECTION_Z),
    ]
    w = LINE_WIDTH
    for (li, lj, lk, i, j, k, direction) in specs:
        cx = (li + i / 2.0) / 3.0
        cy = (lj + j / 2.0) / 3.0
        cz = (lk + k / 2.0) / 3.0
        half = [w, w, w]
        half[direction] = 0.5 + w
        m = jnp.minimum(
            m,
            _box3(
                3.0 * (x - cx), 3.0 * (y - cy), 3.0 * (z - cz),
                0.0, 0.0, 0.0, half[0], half[1], half[2],
            ),
        )
    return m


@register_kernel_brush(_base_brush_fn)
def _base_kernel(x, y, z, ctx):
    outer, inner, height = 0.5, 0.45, 0.05
    r = jnp.sqrt(x * x + z * z)
    new_radius = inner + (outer - inner) * (1.0 - y / height)
    d = jnp.where(y > 0, r - new_radius, r - outer)
    return jnp.maximum(d, jnp.abs(y) - height)


# Interval twins for the exact per-tile cull (ops/pallas/cull.py).
# Hilbert (the expensive brush, ~60 box evals): generic Lipschitz+far-field
# bounds — internal 3x quadrant scaling -> L=3; solid ⊆ ||.||∞ <= ~1.2 about
# the anchored strut center, so far blocks prune it entirely.
from designcsg_tpu.ops.pallas import cull as _cull

_cull.register_lipschitz_interval(
    _hilbert_brush_fn, anchor=(-0.5, -0.5, 0.0), lipschitz=3.0,
    enclosure_radius=1.3,
)


# Base: hand-written exact interval arithmetic (a loose Lipschitz upper
# bound here would grow faster than Hilbert's far-field lower bound and
# block all pruning).
@_cull.register_interval_brush(_base_brush_fn)
def _base_iv(ia, ib, ic, ctx):
    import jax.numpy as _jnp

    outer, inner, height = 0.5, 0.45, 0.05
    r = _cull.iv_sqrt(_cull.iv_add(_cull.iv_square(ia), _cull.iv_square(ic)))
    # new_radius = inner + (outer-inner)*(1 - y/height): affine, decreasing
    # in y, so its interval swaps y's endpoints.
    k = (outer - inner) / height
    nr = (inner + (outer - inner) - k * ib[1], inner + (outer - inner) - k * ib[0])
    d_pos = _cull.iv_sub(r, nr)  # y > 0 branch
    d_neg = _cull.iv_sub(r, _cull.iv_const(outer))  # y <= 0 branch
    # Union of branch intervals wherever y's sign is ambiguous.
    both = (_jnp.minimum(d_pos[0], d_neg[0]), _jnp.maximum(d_pos[1], d_neg[1]))
    d = (
        _jnp.where(ib[0] > 0, d_pos[0], _jnp.where(ib[1] <= 0, d_neg[0], both[0])),
        _jnp.where(ib[0] > 0, d_pos[1], _jnp.where(ib[1] <= 0, d_neg[1], both[1])),
    )
    return _cull.iv_max(d, _cull.iv_sub(_cull.iv_abs(ib), _cull.iv_const(height)))


def build(compiler=None):
    c = api.new_design() if compiler is None else compiler

    hilbert_brush = c.define_brush(_hilbert_brush_fn, name="hilbert")
    base_brush = c.define_brush(_base_brush_fn, name="hilbert_base")

    api.draw(
        hilbert_brush,
        Transform.initial(
            position=np.zeros(3),
            yaw=np.pi / 4,
            pitch=np.pi / 4,
            roll=np.pi / 4,
            scale=np.ones(3),
        ),
        compiler=c,
    )
    api.draw(
        base_brush,
        Transform.initial(
            position=np.array([0.0, -np.sqrt(3 * 0.25) + 0.0075, 0.0]),
            yaw=0.0,
            pitch=0.0,
            roll=0.0,
            scale=np.ones(3),
        ),
        compiler=c,
    )

    c.set_export_config(
        boundingBoxHalfDiameter=2.0,
        minimumOctreeLevel=6,
        maximumOctreeLevel=8,
        gridLevel=9,
        complexSurfaceThreshold=np.pi / 2.0 * 0.5,
        gradientDescentSteps=50,
        cacheSubdivision=16,
        queriesBeforeGC=512,
        queriesBeforeFree=4096,
    )
    return c.commit()
