"""In-kernel sampling of baked 2D fields for Mosaic kernels.

Mosaic's only per-element dynamic indexing primitive on TPU is
``tpu.dynamic_gather`` within a *single vreg* along the gather dimension
(measured on v5e, jax 0.9): 128 lanes for ``take_along_axis(..., axis=1)``,
8 sublanes for ``axis=0``.  A per-element gather from a large 2D table is
not expressible in two composed gathers (the inner gather's index must be
invariant along the outer gather's axis), so dense 2D tables are out.

What IS cheap is a per-element gather from a 128-entry 1D table: broadcast
the table row across sublanes once (loop-invariant, hoisted out of the
march loop) and lane-gather with the element's index — ~1 vector-op slot
per gather (measured: lane gather ≈ fma cost).

This module therefore samples *rank-factored* fields

    b(x, y) ≈ sum_k u_k(x) * v_k(y)

with each ``u_k``/``v_k`` a 128-entry 1D table sampled by lane gather +
linear interpolation: ~9 vector ops per rank term per point, so a rank-32
field costs ~300 op slots — the price of a mid-size closed-form SDF brush,
vs the ~3000-sample reductions it replaces (designs/logo.py letter
brushes), which Mosaic's vector layouts cannot express at all (BASELINE.md
roofline, round 3).  The factors come from a *weighted* low-rank fit
(designs/logo.py::_bake_letter_tables): accuracy is concentrated near the
field's zero set, where march hits and normals live.

No reference counterpart: the reference's OpenCL kernels index ``__global``
arrays freely (k1.cl getAD); this is the TPU-native equivalent capability.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _gather_1d(row_bcast, idx):
    """Per-element gather from a broadcast 1D table: ``row_bcast`` is the
    (8, 128) sublane-broadcast of a 128-entry table, ``idx`` an (8, 128)
    i32 plane of lane indices."""
    return jnp.take_along_axis(row_bcast, idx, axis=1)


def packed_rank_sample(tbl, gx, gy, chunked: bool = True):
    """Rank-factored field sampling, value+slope form: 2 lane gathers per
    axis per term with the interpolation as a single fma.

    ``tbl``: f32[4K, 128] packing four (K, 128) blocks: x-factor values
    ``UA``, x-factor forward-difference slopes ``US`` (``US[:, c] =
    UA[:, c+1] - UA[:, c]``), y-factor values ``VA`` and slopes ``VS``.
    Evaluates ``sum_k (UA_k + fx*US_k)(gx0) * (VA_k + fy*VS_k)(gy0)`` —
    identical to per-axis linear interpolation of the factors.

    ``chunked=True`` (kernel default) issues the gathers per (8, 128)
    vreg — Mosaic's ``tpu.dynamic_gather`` only works within one vreg
    along the gather dim.  Plain-XLA consumers (make_twin_point_eval)
    pass ``chunked=False``: XLA's gather has no vreg constraint, and the
    per-8-row Python loop would unroll tens of thousands of gather ops
    into one jaxpr on big point batches (measured: a 12 GB trace)."""
    K = tbl.shape[0] // 4
    ua, us = tbl[0:K], tbl[K : 2 * K]
    va, vs = tbl[2 * K : 3 * K], tbl[3 * K : 4 * K]
    gx = jnp.clip(gx, 0.0, 126.999)
    gy = jnp.clip(gy, 0.0, 126.999)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    c0 = x0.astype(jnp.int32)
    r0 = y0.astype(jnp.int32)

    # The lane gathers are row-independent, so any (..., 128) block
    # flattens to (8m, 128) planes — the grid kernel hands the tape 3D
    # (rows, yblock, 128) blocks, the point kernel 2D planes.
    shape = c0.shape
    if shape[-1] != 128 or int(np.prod(shape[:-1])) % 8:
        raise ValueError(
            f"packed_rank_sample wants (..., 128) blocks with 8m rows, "
            f"got {gx.shape}"
        )
    c0 = c0.reshape(-1, 128)
    r0 = r0.reshape(-1, 128)
    fx = fx.reshape(-1, 128)
    fy = fy.reshape(-1, 128)
    rows = c0.shape[0]

    if not chunked:
        # Hat-function interpolation as MXU matmuls instead of gathers:
        # sum_c max(0, 1-|g-c|) * UA[k, c] == UA[k, c0] + f * US[k, c0]
        # exactly (two adjacent nonzero weights), but XLA's per-element
        # gather costs ~8 ns/elem on TPU, which made the jnp.take form
        # 3.5x SLOWER than the exact tape in the fit's backward; the
        # 64x extra multiply-adds are free on the MXU.  Also autodiff-
        # friendly: the hat weights carry the d/dg slope a.e.
        import jax

        lane = jnp.arange(128, dtype=tbl.dtype)
        B = 1024  # rows of 128 points per matmul chunk

        def axis_interp(g, val):
            """g (rows, 128) continuous grid coords, val (K, 128) factors
            -> (rows*128, K) interpolated factor values."""
            flat = g.reshape(-1)
            n = flat.shape[0]
            pad = (-n) % (B * 128)
            if pad:
                flat = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)])
            chunks = flat.reshape(-1, B * 128)

            def body(_, gc):
                W = jnp.maximum(1.0 - jnp.abs(gc[:, None] - lane[None, :]), 0.0)
                return None, jnp.dot(
                    W, val.T, precision=jax.lax.Precision.HIGHEST
                )

            _, out = jax.lax.scan(body, None, chunks)
            return out.reshape(-1, val.shape[0])[:n]

        ux = axis_interp(c0.astype(tbl.dtype) + fx, ua)
        vy = axis_interp(r0.astype(tbl.dtype) + fy, va)
        return jnp.sum(ux * vy, axis=-1).reshape(shape)

    def chunk(sl):
        shape = (8, 128)
        acc = jnp.zeros(shape, tbl.dtype)
        for k in range(K):
            ua_row = jnp.broadcast_to(ua[k : k + 1, :], shape)
            us_row = jnp.broadcast_to(us[k : k + 1, :], shape)
            va_row = jnp.broadcast_to(va[k : k + 1, :], shape)
            vs_row = jnp.broadcast_to(vs[k : k + 1, :], shape)
            uk = _gather_1d(ua_row, c0[sl]) + fx[sl] * _gather_1d(us_row, c0[sl])
            vk = _gather_1d(va_row, r0[sl]) + fy[sl] * _gather_1d(vs_row, r0[sl])
            acc = acc + uk * vk
        return acc

    if rows == 8:
        out = chunk(slice(None))
    else:
        out = jnp.concatenate(
            [chunk(slice(i, i + 8)) for i in range(0, rows, 8)], axis=0
        )
    return out.reshape(shape)
