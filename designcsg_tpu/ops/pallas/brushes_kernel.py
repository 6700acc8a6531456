"""Component-wise brush/material implementations for Pallas kernels.

TPU vector layout wants the point components as separate [sublane, 128-lane]
planes; a trailing size-3 vector axis would waste 125 of 128 lanes.  Kernel
brushes therefore take ``(a, b, c)`` component arrays instead of the jnp
path's ``v[..., 3]``.  Each jnp brush registers its component twin here
(keyed by the original function), so a CompiledScene maps onto the kernels
automatically; unregistered brushes make ``supports_scene`` False and callers
fall back to the jnp interpreter — the escape hatch SURVEY.md §7.4 plans for.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp

from ... import brushes as _b
from ...compiler import CompiledScene
from ...constants import MAX_DISTANCE

KERNEL_BRUSHES: Dict[Callable, Callable] = {}
KERNEL_MATERIALS: Dict[Callable, Callable] = {}


def register_kernel_brush(original_fn: Callable):
    """Decorator: register a component-wise twin ``f(a, b, c, ctx) -> d``
    for a jnp brush function."""

    def deco(fn):
        KERNEL_BRUSHES[original_fn] = fn
        return fn

    return deco


def register_kernel_material(original_fn: Callable):
    """Component-wise material twin:
    ``f(gx, gy, gz, lx, ly, lz, nx, ny, nz, ctx) -> (r, g, b)``."""

    def deco(fn):
        KERNEL_MATERIALS[original_fn] = fn
        return fn

    return deco


def _twin_of(fn: Callable) -> Optional[Callable]:
    """Twin lookup: the registry, then a ``__kernel_twin__`` attribute (the
    path for closure-built brushes like the Logo letters, which cannot be
    registered by function identity at import time)."""
    twin = KERNEL_BRUSHES.get(fn)
    return twin if twin is not None else getattr(fn, "__kernel_twin__", None)


def supports_scene(scene: CompiledScene) -> bool:
    """True if every brush/material the scene's tape and banks reference has
    a kernel twin."""
    return all(_twin_of(fn) is not None for fn in scene.brush_fns) and all(
        fn in KERNEL_MATERIALS for fn in scene.material_fns
    )


def kernel_brushes_for_scene(scene: CompiledScene) -> Tuple[Callable, ...]:
    twins = [_twin_of(fn) for fn in scene.brush_fns]
    missing = [
        getattr(fn, "__name__", str(fn))
        for fn, twin in zip(scene.brush_fns, twins)
        if twin is None
    ]
    if missing:
        raise KeyError(
            f"no kernel twin for brushes {missing}; register with "
            f"register_kernel_brush or use the jnp path"
        )
    return tuple(twins)


def scene_preludes(scene: CompiledScene):
    """Ordered ``[(name, prelude_fn)]`` across the scene's brushes.

    A brush's kernel twin may need per-scene arrays computed OUTSIDE the
    kernel (e.g. the Logo letters' Bezier sample table, derived from the
    differentiable arbitrary-data blob): the brush function carries
    ``__kernel_prelude__ = {name: fn(arrays) -> jnp.ndarray}``; each array
    is passed to the kernels as an extra VMEM input and surfaces to the
    twin as ``ctx.extras[name]``.  Names must be unique per scene."""
    out = []
    seen = {}
    for fn in scene.brush_fns:
        for name, pf in getattr(fn, "__kernel_prelude__", {}).items():
            if name in seen:
                if seen[name] is not pf:
                    raise ValueError(
                        f"duplicate kernel-prelude name {name!r} with "
                        f"different builders — prelude names must be unique "
                        f"per scene (suffix them per brush instance)"
                    )
                continue
            seen[name] = pf
            out.append((name, pf))
    return out


def kernel_materials_for_scene(scene: CompiledScene) -> Tuple[Callable, ...]:
    missing = [
        getattr(fn, "__name__", str(fn))
        for fn in scene.material_fns
        if fn not in KERNEL_MATERIALS
    ]
    if missing:
        raise KeyError(f"no kernel twin for materials {missing}")
    return tuple(KERNEL_MATERIALS[fn] for fn in scene.material_fns)


# -- builtin brushes (twins of brushes.py) ----------------------------------


@register_kernel_brush(_b.empty_brush_fn)
def _empty(a, b, c, ctx):
    return jnp.full_like(a, MAX_DISTANCE)


@register_kernel_brush(_b.space_brush_fn)
def _space(a, b, c, ctx):
    return jnp.zeros_like(a)


@register_kernel_brush(_b.sphere_brush_fn)
def _sphere(a, b, c, ctx):
    return jnp.sqrt(a * a + b * b + c * c) - 0.5


@register_kernel_brush(_b.cylinder_brush_fn)
def _cylinder(a, b, c, ctx):
    x = jnp.sqrt(a * a + c * c)
    return jnp.maximum(x - 0.5, jnp.abs(b) - 0.5)


@register_kernel_brush(_b.box_brush_fn)
def _box(a, b, c, ctx):
    return jnp.maximum(
        jnp.abs(a) - 0.5, jnp.maximum(jnp.abs(b) - 0.5, jnp.abs(c) - 0.5)
    )


# -- builtin materials ------------------------------------------------------


@register_kernel_material(_b.abs_normals_fn)
def _abs_normals(gx, gy, gz, lx, ly, lz, nx, ny, nz, ctx):
    return jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)


@register_kernel_material(_b.basic_lighting_fn)
def _basic_lighting(gx, gy, gz, lx, ly, lz, nx, ny, nz, ctx):
    # L = dot(n rotated to global frame, (0,0,-1)) = -(n . fwd-column z)
    rgt, upp, fwd = ctx.rgt, ctx.upp, ctx.fwd
    ngz = nx * rgt[2] + ny * upp[2] + nz * fwd[2]
    light = -ngz
    return light, light, light
