"""Trace-time-staged component tape evaluator shared by the Pallas kernels.

Same partial-evaluation move as ops/interpreter.py (the tape is static per
scene) but on component planes: registers are (a-plane-sized) arrays, IMPORT's
frame transform is 9 scalar multiplies per component from SMEM-resident bank
scalars, brush dispatch is a direct call into the component registry.
Reference semantics: k2.cl:47-144.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...compiler import CompiledScene
from ...constants import (
    AXES_RADIUS,
    INITIAL_SCALE,
    MAX_DISTANCE,
    OP_EXPORT,
    OP_IDENTITY,
    OP_IMPORT,
    OP_MAX,
    OP_MIN,
    OP_NEGATE,
)
from .brushes_kernel import kernel_brushes_for_scene


def make_component_tape(scene: CompiledScene, gizmo: bool = False) -> Callable:
    """Build ``tape_eval(x, y, z, bank, ctx, cull=None) -> d`` where x/y/z
    are component arrays and ``bank(i) -> (o3, r3, u3, f3)`` yields the 12
    object-row scalars (from SMEM refs inside a kernel, or plain arrays in
    tests).

    ``cull`` is an optional ``(groups, preds, substs)`` triple from a
    cull.make_tape_culler(scene, gizmo) culler (its static ``.groups`` plus
    the per-step predicates/substitutes): each group of IMPORT slots (slot
    ``n_imports`` is the gizmo) evaluates its brushes under ONE
    ``lax.cond``, substituting the proven-exact scalar bounds otherwise —
    the instruction-issue-bound tape then skips whole brush evaluations for
    tiles they cannot influence, paying one branch per *group* (a live
    Mosaic branch costs about one cheap brush eval, so cheap siblings share
    a branch — see cull.py)."""
    tape = [tuple(int(v) for v in row) for row in np.asarray(scene.arrays.tape)]
    kbrushes = kernel_brushes_for_scene(scene)
    # (brush, obj) per IMPORT slot, in tape order; slot n_imports = gizmo.
    import_slots = [
        (left, right) for opcode, left, right, _ in tape if opcode == OP_IMPORT
    ]
    n_imports = len(import_slots)

    def tape_eval(x, y, z, bank, ctx, cull=None):
        def eval_slot(k):
            if k == n_imports:
                return gizmo_component_sdf(x, y, z)
            brush, obj = import_slots[k]
            (ox, oy, oz), r3, u3, f3 = bank(obj)
            dx, dy, dz = x - ox, y - oy, z - oz
            a = dx * r3[0] + dy * r3[1] + dz * r3[2]
            b = dx * u3[0] + dy * u3[1] + dz * u3[2]
            c = dx * f3[0] + dy * f3[1] + dz * f3[2]
            return kbrushes[brush](a, b, c, ctx)

        values = {}
        if cull is not None:
            groups, preds, substs = cull
            for gid, members in enumerate(groups):
                vals = jax.lax.cond(
                    preds[gid],
                    lambda members=members: tuple(
                        eval_slot(k) for k in members
                    ),
                    lambda members=members: tuple(
                        x * 0.0 + substs[k] for k in members
                    ),
                )
                for k, v in zip(members, vals):
                    values[k] = v

        regs = {}
        k = 0
        export = jnp.full_like(x, MAX_DISTANCE)
        for opcode, left, right, dest in tape:
            if opcode == OP_IMPORT:
                regs[dest] = values[k] if k in values else eval_slot(k)
                k += 1
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
        if gizmo:
            gz = values[n_imports] if n_imports in values else eval_slot(n_imports)
            export = jnp.minimum(export, gz)
        return export

    return tape_eval


def gizmo_component_sdf(x, y, z, radius: float = AXES_RADIUS):
    """Component twin of ops.interpreter.gizmo_sdf (k1.cl:237-270)."""
    xs, ys, zs = x / INITIAL_SCALE, y / INITIAL_SCALE, z / INITIAL_SCALE

    def cyl(r2, h):
        return jnp.maximum(jnp.abs(h) - 0.5, jnp.sqrt(r2) - radius)

    dx = cyl(ys * ys + zs * zs, xs - 0.5)
    dy = cyl(xs * xs + zs * zs, ys - 0.5)
    dz = cyl(xs * xs + ys * ys, zs - 0.5)
    return jnp.minimum(dx, jnp.minimum(dy, dz))


def smem_bank_reader(pos_ref, right_ref, up_ref, fwd_ref):
    """Bank accessor over SMEM refs (object rows are a few KB of scalars)."""

    def bank(i: int):
        o = (pos_ref[i, 0], pos_ref[i, 1], pos_ref[i, 2])
        r = (right_ref[i, 0], right_ref[i, 1], right_ref[i, 2])
        u = (up_ref[i, 0], up_ref[i, 1], up_ref[i, 2])
        f = (fwd_ref[i, 0], fwd_ref[i, 1], fwd_ref[i, 2])
        return o, r, u, f

    return bank


def array_bank_reader(arrays):
    """Bank accessor over plain arrays (interpret-mode tests)."""

    def bank(i: int):
        return (
            tuple(arrays.position[i]),
            tuple(arrays.right[i]),
            tuple(arrays.up[i]),
            tuple(arrays.forward[i]),
        )

    return bank
