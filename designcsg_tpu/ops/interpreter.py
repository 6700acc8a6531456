"""Vectorized CSG tape interpreter.

The scene IR is a register-machine tape of IMPORT/EXPORT/MIN/MAX/NEGATE/
IDENTITY commands over a small register file (reference semantics:
/root/reference/master/k2.cl:47-144, identical copy in k1.cl:186-234).  Two
evaluation strategies are provided:

1. **Staged** (:func:`make_primary_sdf`) — the tape contents are static at
   scene-compile time, so the interpreter *unrolls the tape at JAX trace
   time*: registers become Python-named intermediates, brush dispatch becomes
   a direct call, and XLA fuses the whole program into one elementwise kernel.
   This is the TPU-native analog of the reference's runtime OpenCL source
   concatenation (DesignCSG.cpp:545-546) and is fully differentiable w.r.t.
   the object banks and arbitrary data.

2. **Dynamic** (:func:`make_dynamic_primary_sdf`) — the tape is a runtime
   i32[T,4] array driving a ``lax.fori_loop`` with a ``lax.switch`` over
   opcodes and a ``lax.switch`` over the brush bank.  Used when the tape must
   vary without retracing, and as a differential test of the staged path.

Both operate on arbitrary leading batch dimensions: ``points`` is f32[..., 3]
and the result is f32[...].
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..brushes import EvalContext
from ..compiler import CompiledScene, SceneArrays
from ..constants import (
    AXES_RADIUS,
    INITIAL_SCALE,
    MAX_DISTANCE,
    NORMAL_EPSILON,
    OP_EXPORT,
    OP_IDENTITY,
    OP_IMPORT,
    OP_MAX,
    OP_MIN,
    OP_NEGATE,
)


def as_device_arrays(arrays: SceneArrays) -> SceneArrays:
    """Convert all bank fields to jnp arrays (needed before traced indexing)."""
    return SceneArrays(
        shape_id=jnp.asarray(arrays.shape_id),
        material_id=jnp.asarray(arrays.material_id),
        position=jnp.asarray(arrays.position),
        right=jnp.asarray(arrays.right),
        up=jnp.asarray(arrays.up),
        forward=jnp.asarray(arrays.forward),
        tape=jnp.asarray(arrays.tape),
        ad=jnp.asarray(arrays.ad),
    )


def _import_local_coords(points, arrays: SceneArrays, obj_index):
    """Transform world points into an object's local frame:
    ``ABC = ((v-o)@right, (v-o)@up, (v-o)@forward)`` with reciprocal frame
    rows (k2.cl:105-113)."""
    o = arrays.position[obj_index]
    rel = points - o
    a = jnp.sum(rel * arrays.right[obj_index], axis=-1)
    b = jnp.sum(rel * arrays.up[obj_index], axis=-1)
    c = jnp.sum(rel * arrays.forward[obj_index], axis=-1)
    return jnp.stack([a, b, c], axis=-1)


def axes_cylinder_sdf(r, h, half_length, radius):
    """max(|h|-halfLength, r-radius) (k1.cl:41-43)."""
    return jnp.maximum(jnp.abs(h) - half_length, r - radius)


def gizmo_sdf(points, radius=AXES_RADIUS):
    """The three axis-gizmo cylinders the viewport kernel unions in after the
    tape, at 1/5 world scale (k1.cl:237-270).  k2 (export) has no gizmo."""
    v = points / INITIAL_SCALE
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    dx = axes_cylinder_sdf(jnp.sqrt(y * y + z * z), x - 0.5, 0.5, radius)
    dy = axes_cylinder_sdf(jnp.sqrt(x * x + z * z), y - 0.5, 0.5, radius)
    dz = axes_cylinder_sdf(jnp.sqrt(x * x + y * y), z - 0.5, 0.5, radius)
    return jnp.minimum(dx, jnp.minimum(dy, dz))


def make_primary_sdf(
    scene: CompiledScene, gizmo: bool = False, proxy: bool = False
) -> Callable:
    """Stage the scene's tape into a pure JAX function
    ``sdf(points, arrays) -> distances``.

    ``arrays`` is passed as a traced argument so gradients flow to object
    banks and arbitrary data; the tape structure and brush bank come from
    ``scene`` and are baked in at trace time.

    ``proxy`` substitutes each brush's ``__proxy_fn__`` (a cheap LOWER bound
    of the brush SDF, e.g. the Logo letters' plate clip in place of the 3k-
    sample Bezier distance) where one exists — the conservative scene the
    two-phase proxy march steps through open space (ops/raymarch.py).
    """
    tape = [tuple(int(x) for x in row) for row in np.asarray(scene.arrays.tape)]
    brush_fns = scene.brush_fns
    if proxy:
        brush_fns = [
            getattr(fn, "__proxy_fn__", None) or fn for fn in brush_fns
        ]

    def primary_sdf(points, arrays: Optional[SceneArrays] = None):
        if arrays is None:
            arrays = scene.arrays
        ctx = EvalContext(ad=arrays.ad)
        regs = {}
        export = jnp.full(points.shape[:-1], MAX_DISTANCE, dtype=points.dtype)
        for opcode, left, right, dest in tape:
            if opcode == OP_IMPORT:
                local = _import_local_coords(points, arrays, right)
                regs[dest] = brush_fns[left](local, ctx)
            elif opcode == OP_EXPORT:
                export = regs[left]
            elif opcode == OP_MIN:
                regs[dest] = jnp.minimum(regs[left], regs[right])
            elif opcode == OP_MAX:
                regs[dest] = jnp.maximum(regs[left], regs[right])
            elif opcode == OP_NEGATE:
                regs[dest] = -regs[left]
            elif opcode == OP_IDENTITY:
                regs[dest] = regs[left]
            else:
                raise ValueError(f"unknown opcode {opcode}")
        if gizmo:
            export = jnp.minimum(export, gizmo_sdf(points))
        return export

    return primary_sdf


def make_dynamic_primary_sdf(scene: CompiledScene, gizmo: bool = False) -> Callable:
    """Runtime-tape interpreter: ``sdf(points, arrays) -> distances`` where
    ``arrays.tape`` is traced data (i32[T,4]).

    The register file is a dense ``f32[R, ...]`` array updated with dynamic
    slices; opcode dispatch is a ``lax.switch``.  Only the brush *bank* is
    static (brush function list)."""
    brush_fns = scene.brush_fns
    num_registers = max(scene.num_registers, 1)

    def primary_sdf(points, arrays: Optional[SceneArrays] = None):
        if arrays is None:
            arrays = scene.arrays
        arrays = as_device_arrays(arrays)
        ctx = EvalContext(ad=arrays.ad)
        batch_shape = points.shape[:-1]
        regs0 = jnp.full((num_registers,) + batch_shape, MAX_DISTANCE, dtype=points.dtype)
        export0 = jnp.full(batch_shape, MAX_DISTANCE, dtype=points.dtype)
        tape = jnp.asarray(arrays.tape)
        n_steps = tape.shape[0]

        def import_value(left, right):
            local = _import_local_coords(points, arrays, right)
            branches = [partial(lambda f, v: f(v, ctx), f) for f in brush_fns]
            return jax.lax.switch(jnp.clip(left, 0, len(brush_fns) - 1), branches, local)

        def body(t, carry):
            regs, export = carry
            opcode, left, right, dest = tape[t, 0], tape[t, 1], tape[t, 2], tape[t, 3]
            left_c = jnp.clip(left, 0, num_registers - 1)
            right_c = jnp.clip(right, 0, num_registers - 1)

            def do_import(regs, export):
                value = import_value(left, right)
                return regs.at[dest].set(value), export

            def do_export(regs, export):
                return regs, regs[left_c]

            def do_min(regs, export):
                return regs.at[dest].set(jnp.minimum(regs[left_c], regs[right_c])), export

            def do_max(regs, export):
                return regs.at[dest].set(jnp.maximum(regs[left_c], regs[right_c])), export

            def do_negate(regs, export):
                return regs.at[dest].set(-regs[left_c]), export

            def do_identity(regs, export):
                return regs.at[dest].set(regs[left_c]), export

            return jax.lax.switch(
                jnp.clip(opcode, 0, 5),
                [do_import, do_export, do_min, do_max, do_negate, do_identity],
                regs,
                export,
            )

        _, export = jax.lax.fori_loop(0, n_steps, body, (regs0, export0))
        if gizmo:
            export = jnp.minimum(export, gizmo_sdf(points))
        return export

    return primary_sdf


def brute_force_min_sdf(scene: CompiledScene, points, arrays: Optional[SceneArrays] = None):
    """The semantic oracle for purely-additive scenes: MIN over every object's
    own SDF (the commented-out reference loop, k1.cl:157-184)."""
    if arrays is None:
        arrays = scene.arrays
    ctx = EvalContext(ad=arrays.ad)
    best = jnp.full(points.shape[:-1], MAX_DISTANCE, dtype=points.dtype)
    for i in range(arrays.shape_id.shape[0]):
        local = _import_local_coords(points, arrays, i)
        d = scene.brush_fns[int(arrays.shape_id[i])](local, ctx)
        best = jnp.minimum(best, d)
    return best


def make_normal_fn(
    sdf_fn: Callable,
    mode: str = "fd",
    epsilon: float = NORMAL_EPSILON,
) -> Callable:
    """Surface normal estimator ``normals(points, arrays) -> f32[..., 3]``.

    ``mode="fd"`` reproduces the reference's central finite differences
    (6 extra SDF evals, epsilon 0.005, normalized; k1.cl:381-418).
    ``mode="analytic"`` uses JAX autodiff of the tape program — exact, fewer
    evals, and what the reference cannot do.
    """
    if mode == "fd":

        def normals(points, arrays=None):
            def d(offset):
                return sdf_fn(points + offset, arrays)

            e = jnp.asarray(epsilon, dtype=points.dtype)
            zero = jnp.zeros((), dtype=points.dtype)
            dx = jnp.stack([e, zero, zero])
            dy = jnp.stack([zero, e, zero])
            dz = jnp.stack([zero, zero, e])
            gx = d(dx) - d(-dx)
            gy = d(dy) - d(-dy)
            gz = d(dz) - d(-dz)
            g = jnp.stack([gx, gy, gz], axis=-1) / (2.0 * e)
            return g / jnp.linalg.norm(g, axis=-1, keepdims=True)

        return normals

    if mode == "analytic":

        def normals(points, arrays=None):
            flat = points.reshape(-1, 3)

            def scalar_sdf(p):
                return sdf_fn(p[None, :], arrays)[0]

            g = jax.vmap(jax.grad(scalar_sdf))(flat)
            g = g.reshape(points.shape)
            return g / jnp.linalg.norm(g, axis=-1, keepdims=True)

        return normals

    raise ValueError(f"unknown normal mode {mode!r}")
