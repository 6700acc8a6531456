"""Fused Pallas sphere-trace render kernel (the k1 hot loop).

One kernel instance renders an (8, 128) pixel tile end-to-end: ray setup from
the tile's grid position, the full masked march loop, FD normals, the
material-attribution scan, gizmo and background rules — all on VMEM/register
planes with zero HBM traffic until the final RGB write.  Two structural wins
over the jnp while_loop renderer:

* no per-step HBM round-trips for the march state;
* *per-tile* early exit — a background tile stops after its own ~40 steps
  instead of riding along for the worst pixel in the whole image (the jnp
  global loop's cond is a full-image all()).

Reference semantics: k1.cl:420-470 (march), 381-418 (normal), 280-379
(shade), 480-580 (pixel setup).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...brushes import EvalContext
from ...compiler import CompiledScene, SceneArrays
from ...config import RenderConfig
from ...constants import AXES_SHADE_RADIUS, INITIAL_SCALE, MAX_DISTANCE
from .brushes_kernel import kernel_brushes_for_scene, kernel_materials_for_scene
from .cull import make_tape_culler, ray_box
from .sdf_kernel import _bank_inputs, _bank_specs, _split_bank_refs
from .tape import make_component_tape, smem_bank_reader


def _plane_interval(p):
    return (jnp.min(p), jnp.max(p))

TILE_H = 8
TILE_W = 128


def make_pallas_ray_march(
    scene: CompiledScene,
    config: Optional[RenderConfig] = None,
    interpret: bool = False,
):
    """Batched ray-march kernel:
    ``ray_march(arrays, o_proj f32[3], rays f32[..., 3]) -> (d, vmin)`` with
    ``d f32[...]`` the signed hit distance (-1 on miss) and ``vmin
    f32[..., 3]`` each ray's closest-approach point — exactly the pair the
    differentiable render needs (ops/raymarch.py): the march itself runs
    under stop_gradient with IFT/soft-silhouette gradient reattachment, so
    this forward-only kernel IS the fit harness's fast path.  Semantics
    match ops.raymarch.make_march(return_closest=True) (k1.cl:420-470).

    Unlike :func:`make_pallas_renderer` the rays are an *input* (any batch
    shape), so shard_map can hand each device its own ray block.  Tiles are
    (8, 128) = 1024 rays with per-tile early exit.  Plain (omega == 1)
    stepping only — the differentiable paths use exact reference stepping.
    """
    if config is None:
        config = RenderConfig(gizmo=False)
    tape_eval = make_component_tape(scene, gizmo=config.gizmo)
    eps = config.sdf_epsilon
    tol = config.march_tolerance
    max_d = config.max_distance
    max_steps = config.max_steps
    unroll = max(1, int(getattr(config, "march_unroll", 1)))

    SUB_R = 8  # rows per tile: 1024 rays per early-exit group

    def kernel(scal_ref, *refs):
        pos_ref, right_ref, up_ref, fwd_ref, ad_ref, extras, rest = (
            _split_bank_refs(scene, refs)
        )
        rx_ref, ry_ref, rz_ref, d_out, vx_out, vy_out, vz_out = rest
        bank = smem_bank_reader(pos_ref, right_ref, up_ref, fwd_ref)
        ctx = EvalContext(ad=ad_ref, extras=extras)

        def sdf(x, y, z):
            return tape_eval(x, y, z, bank, ctx)

        ox, oy, oz = scal_ref[0], scal_ref[1], scal_ref[2]
        n_valid = scal_ref[3]
        rx = rx_ref[:]
        ry = ry_ref[:]
        rz = rz_ref[:]
        i = pl.program_id(0)
        r = jax.lax.broadcasted_iota(jnp.int32, (SUB_R, TILE_W), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (SUB_R, TILE_W), 1)
        idx = ((i * SUB_R + r) * TILE_W + c).astype(jnp.float32)

        zero = rx * 0.0
        vx0 = zero + ox
        vy0 = zero + oy
        vz0 = zero + oz
        d0 = zero
        hit0 = zero
        # Padding rays start as misses so a ragged tail tile exits fast.
        miss0 = jnp.where(idx < n_valid, 0.0, 1.0)
        smin0 = zero + MAX_DISTANCE
        vmx0, vmy0, vmz0 = vx0, vy0, vz0

        def cond(state):
            step = state[0]
            hit, miss = state[5], state[6]
            return jnp.logical_and(step < max_steps, jnp.min(hit + miss) < 0.5)

        def body(state):
            step, vx, vy, vz, d, hit, miss, smin, vmx, vmy, vmz = state
            for i in range(unroll):
                # step enters ≡ 0 (mod unroll) with step < max_steps, so
                # when unroll divides max_steps every micro-step is within
                # the budget and the gate is statically elided.
                if max_steps % unroll:
                    within = jnp.where(step + i < max_steps, 1.0, 0.0)
                    active = (1.0 - hit) * (1.0 - miss) * within
                else:
                    active = (1.0 - hit) * (1.0 - miss)
                s = sdf(vx, vy, vz) * tol
                closer = active * jnp.where(s < smin, 1.0, 0.0)
                smin = jnp.where(closer > 0.5, s, smin)
                vmx = jnp.where(closer > 0.5, vx, vmx)
                vmy = jnp.where(closer > 0.5, vy, vmy)
                vmz = jnp.where(closer > 0.5, vz, vmz)
                new_hit = active * jnp.where(s < eps, 1.0, 0.0)
                advance = active * (1.0 - new_hit)
                vx = vx + advance * s * rx
                vy = vy + advance * s * ry
                vz = vz + advance * s * rz
                d = d + advance * s
                new_miss = advance * jnp.where(d > max_d, 1.0, 0.0)
                hit = jnp.maximum(hit, new_hit)
                miss = jnp.maximum(miss, new_miss)
            return (
                step + unroll, vx, vy, vz, d, hit, miss, smin, vmx, vmy, vmz
            )

        state = (
            jnp.int32(0), vx0, vy0, vz0, d0, hit0, miss0,
            smin0, vmx0, vmy0, vmz0,
        )
        state = jax.lax.while_loop(cond, body, state)
        _, _, _, _, d, hit, _, _, vmx, vmy, vmz = state
        d_out[:] = jnp.where(hit > 0.5, d, -1.0)
        vx_out[:] = vmx
        vy_out[:] = vmy
        vz_out[:] = vmz

    tile_rays = SUB_R * TILE_W

    @jax.jit
    def ray_march(arrays: SceneArrays, o_proj, rays):
        batch = rays.shape[:-1]
        flat = rays.reshape(-1, 3).astype(jnp.float32)
        n = flat.shape[0]
        pad = (-n) % tile_rays
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, 3), jnp.float32)], axis=0
            )
        rows = flat.shape[0] // TILE_W
        scalars = jnp.concatenate(
            [
                jnp.asarray(o_proj, jnp.float32).reshape(3),
                jnp.float32(n).reshape(1),
            ]
        )
        plane = pl.BlockSpec(
            (SUB_R, TILE_W), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out_s = jax.ShapeDtypeStruct((rows, TILE_W), jnp.float32)
        d, vmx, vmy, vmz = pl.pallas_call(
            kernel,
            grid=(rows // SUB_R,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + _bank_specs(scene)
            + [plane, plane, plane],
            out_specs=(plane, plane, plane, plane),
            out_shape=(out_s, out_s, out_s, out_s),
            interpret=interpret,
        )(
            scalars,
            *_bank_inputs(arrays, scene),
            flat[:, 0].reshape(rows, TILE_W),
            flat[:, 1].reshape(rows, TILE_W),
            flat[:, 2].reshape(rows, TILE_W),
        )
        d = d.reshape(-1)[:n].reshape(batch)
        vmin = jnp.stack(
            [vmx.reshape(-1)[:n], vmy.reshape(-1)[:n], vmz.reshape(-1)[:n]],
            axis=-1,
        ).reshape(batch + (3,))
        return d, vmin

    return ray_march


def make_pallas_cone_march(
    scene: CompiledScene,
    config: Optional[RenderConfig] = None,
    cone_slope: float = 0.0,
    interpret: bool = False,
    strict: bool = False,
):
    """Cone prepass: ``cone_march(arrays, o_proj f32[3], rays f32[..., 3])
    -> t_safe f32[...]`` — march each (block-center) ray with the
    cone-inflated hit condition ``s < (eps + d * cone_slope)``, returning
    the parameter of the *previous* visited point when the march stops.

    The Lipschitz argument: rays are the projected (uvx, uvy, IFOV) vectors
    (orthonormal frame, so |Δray| = |Δuv|); any covered ray's position at
    parameter t is within t * cone_slope' of the center ray's (cone_slope
    already includes the caller's safety factor), hence its SDF stays above
    eps for all t ≤ t_safe, and sphere-tracing the covered ray from t_safe
    visits the same surface it would from 0 (k1.cl:420-470 semantics)."""
    if config is None:
        config = RenderConfig(gizmo=False)
    tape_eval = make_component_tape(scene, gizmo=config.gizmo)
    eps = config.sdf_epsilon
    tol = config.march_tolerance
    max_d = config.max_distance
    max_steps = config.max_steps
    slope = float(cone_slope)
    unroll = max(1, int(getattr(config, "march_unroll", 1)))

    SUB_R = 8

    def kernel(scal_ref, *refs):
        pos_ref, right_ref, up_ref, fwd_ref, ad_ref, extras, rest = (
            _split_bank_refs(scene, refs)
        )
        rx_ref, ry_ref, rz_ref, t_out = rest
        bank = smem_bank_reader(pos_ref, right_ref, up_ref, fwd_ref)
        ctx = EvalContext(ad=ad_ref, extras=extras)

        def sdf(x, y, z):
            return tape_eval(x, y, z, bank, ctx)

        ox, oy, oz = scal_ref[0], scal_ref[1], scal_ref[2]
        n_valid = scal_ref[3]
        rx, ry, rz = rx_ref[:], ry_ref[:], rz_ref[:]
        i = pl.program_id(0)
        r = jax.lax.broadcasted_iota(jnp.int32, (SUB_R, TILE_W), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (SUB_R, TILE_W), 1)
        idx = ((i * SUB_R + r) * TILE_W + c).astype(jnp.float32)

        zero = rx * 0.0
        vx0 = zero + ox
        vy0 = zero + oy
        vz0 = zero + oz
        d0 = zero
        done0 = jnp.where(idx < n_valid, 0.0, 1.0)
        tprev0 = zero

        def cond(state):
            step, done = state[0], state[5]
            return jnp.logical_and(step < max_steps, jnp.min(done) < 0.5)

        def body(state):
            step, vx, vy, vz, d, done, tprev = state
            for i in range(unroll):
                if max_steps % unroll:
                    within = jnp.where(step + i < max_steps, 1.0, 0.0)
                    active = (1.0 - done) * within
                else:
                    active = 1.0 - done
                s = sdf(vx, vy, vz) * tol
                stop = active * jnp.where(s < eps + d * slope, 1.0, 0.0)
                advance = active * (1.0 - stop)
                # The point at d is only provisionally safe: commit it to
                # tprev just before stepping PAST it, so on stop tprev is
                # the previous visited point.
                tprev = jnp.where(advance > 0.5, d, tprev)
                vx = vx + advance * s * rx
                vy = vy + advance * s * ry
                vz = vz + advance * s * rz
                d = d + advance * s
                # A miss (left the scene) makes the whole remaining ray safe
                # — unless strict, where fine rays must march the prepass's
                # final unverified segment themselves (ADVICE r2: the miss
                # shortcut can drop thin/far features).
                miss = advance * jnp.where(d > max_d, 1.0, 0.0)
                if not strict:
                    tprev = jnp.where(miss > 0.5, d, tprev)
                done = jnp.minimum(done + stop + miss, 1.0)
            return (step + unroll, vx, vy, vz, d, done, tprev)

        state = (jnp.int32(0), vx0, vy0, vz0, d0, done0, tprev0)
        state = jax.lax.while_loop(cond, body, state)
        t_out[:] = state[6]

    tile_rays = SUB_R * TILE_W

    @jax.jit
    def cone_march(arrays: SceneArrays, o_proj, rays):
        batch = rays.shape[:-1]
        flat = rays.reshape(-1, 3).astype(jnp.float32)
        n = flat.shape[0]
        pad = (-n) % tile_rays
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, 3), jnp.float32)], axis=0
            )
        rows = flat.shape[0] // TILE_W
        scalars = jnp.concatenate(
            [
                jnp.asarray(o_proj, jnp.float32).reshape(3),
                jnp.float32(n).reshape(1),
            ]
        )
        plane = pl.BlockSpec(
            (SUB_R, TILE_W), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        t = pl.pallas_call(
            kernel,
            grid=(rows // SUB_R,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + _bank_specs(scene)
            + [plane, plane, plane],
            out_specs=plane,
            out_shape=jax.ShapeDtypeStruct((rows, TILE_W), jnp.float32),
            interpret=interpret,
        )(
            scalars,
            *_bank_inputs(arrays, scene),
            flat[:, 0].reshape(rows, TILE_W),
            flat[:, 1].reshape(rows, TILE_W),
            flat[:, 2].reshape(rows, TILE_W),
        )
        return t.reshape(-1)[:n].reshape(batch)

    return cone_march


def make_pallas_renderer(
    scene: CompiledScene,
    config: Optional[RenderConfig] = None,
    interpret: bool = False,
    block_layout: Optional[bool] = None,
    t0_input: bool = False,
):
    """``render(arrays, campos, rgt, upp, fwd) -> f32[H, W, 3]`` — drop-in
    replacement for ops.raymarch.make_renderer's forward (non-differentiable)
    path, fused into one kernel launch.

    ``block_layout`` maps each (8, 128) vector tile onto a *square 32x32
    pixel block* instead of a wide stripe: ray divergence is spatially
    coherent, so square tiles early-exit much sooner (background blocks stop
    after a few steps instead of riding along with a silhouette pixel 128
    columns away).  Auto-enabled when the viewport divides by 32."""
    if config is None:
        config = RenderConfig()
    unroll = max(1, int(getattr(config, "march_unroll", 1)))
    if block_layout is None:
        block_layout = config.width % 32 == 0 and config.height % 32 == 0
    if block_layout:
        assert config.width % 32 == 0 and config.height % 32 == 0, (
            f"viewport {config.width}x{config.height} must tile by 32x32"
        )
    else:
        assert config.width % TILE_W == 0 and config.height % TILE_H == 0, (
            f"viewport {config.width}x{config.height} must tile by "
            f"{TILE_W}x{TILE_H}"
        )
    tape_eval = make_component_tape(scene, gizmo=config.gizmo)
    # march_cull=None (default) means OFF — see cull.worth_culling's
    # docstring for the measured economics.  True = one hoisted cull per
    # tile over its whole view-cone segment (cheap, but the [t0, max_d]
    # box usually spans every object).  "dynamic" = re-derive the cull
    # predicates at EVERY march micro-step from the box of the tile's
    # current ACTIVE-ray positions: the box is exactly the set of points
    # about to be evaluated, so the interval substitution argument applies
    # verbatim (no segment extension, no drift pad), and mid-march tiles
    # hugging one letter plate skip the other expensive brushes — the mode
    # built for Logo-class scenes, where the hoisted cull prunes nothing.
    cull_mode = getattr(config, "march_cull", None)
    culler = (
        make_tape_culler(scene, gizmo=config.gizmo) if cull_mode else None
    )
    dynamic_cull = culler is not None and cull_mode == "dynamic"
    kbrushes = kernel_brushes_for_scene(scene)
    kmaterials = kernel_materials_for_scene(scene)
    shape_id = [int(s) for s in np.asarray(scene.arrays.shape_id)]
    material_id = [int(m) for m in np.asarray(scene.arrays.material_id)]
    n_objects = len(shape_id)

    eps = config.sdf_epsilon
    tol = config.march_tolerance
    max_d = config.max_distance
    max_steps = config.max_steps
    omega = float(getattr(config, "march_overrelax", 1.0))
    n_eps = config.normal_epsilon
    mat_thresh = config.sdf_epsilon * config.material_tolerance
    w2 = config.width / 2.0
    h2 = config.height / 2.0
    ifov = config.ifov
    miss_color = config.miss_color
    background = config.background

    def kernel(cam_ref, *refs):
        pos_ref, right_ref, up_ref, fwd_ref, ad_ref, extras, rest = (
            _split_bank_refs(scene, refs)
        )
        if t0_input:
            t0_ref, r_out, g_out, b_out = rest
        else:
            r_out, g_out, b_out = rest
        bank = smem_bank_reader(pos_ref, right_ref, up_ref, fwd_ref)
        rgt = (cam_ref[1, 0], cam_ref[1, 1], cam_ref[1, 2])
        upp = (cam_ref[2, 0], cam_ref[2, 1], cam_ref[2, 2])
        fwd = (cam_ref[3, 0], cam_ref[3, 1], cam_ref[3, 2])
        ctx = EvalContext(ad=ad_ref, rgt=rgt, upp=upp, fwd=fwd, extras=extras)

        def sdf(x, y, z, cull=None):
            return tape_eval(x, y, z, bank, ctx, cull)

        i = pl.program_id(0)
        j = pl.program_id(1)
        r = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
        if block_layout:
            # tile (r, c) -> 32x32 block pixel (r*4 + c//32, c%32)
            iy = i * 32 + r * 4 + c // 32
            ix = j * 32 + c % 32
        else:
            iy = r + i * TILE_H
            ix = c + j * TILE_W
        uvx = (ix.astype(jnp.float32) - w2) / w2
        uvy = -(iy.astype(jnp.float32) - h2) / w2
        # ray = (uv.x, uv.y, IFOV) projected onto the frame (k1.cl:506-528);
        # NOT normalized (reference quirk).
        rx = uvx * rgt[0] + uvy * rgt[1] + ifov * rgt[2]
        ry = uvx * upp[0] + uvy * upp[1] + ifov * upp[2]
        rz = uvx * fwd[0] + uvy * fwd[1] + ifov * fwd[2]
        ox, oy, oz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]

        shape = (TILE_H, TILE_W)
        # Derive initial carries from the iota-based ray arrays: a plain
        # broadcast of an SMEM scalar has a *replicated* vector layout, and
        # Mosaic cannot relayout a while-loop carry that becomes concrete
        # inside the loop ("Invalid relayout ... replicated in destination").
        zero = rx * 0.0
        # With a cone-prepass t0 plane, every ray starts at its own safe
        # parameter (d accumulates from t0, matching the full march's
        # parameterization); otherwise at the camera.
        d0 = t0_ref[:] if t0_input else zero
        vx0 = zero + ox + d0 * rx
        vy0 = zero + oy + d0 * ry
        vz0 = zero + oz + d0 * rz
        # Masks are f32 0/1 — Mosaic cannot carry i1 vectors through
        # scf.while ("failed to legalize scf.yield").
        hit0 = zero
        # A prepass handoff past the far plane is already a miss (the plain
        # march never hit-tests points with d > max_d; the prepass's own
        # last landing point is unevaluated and could graze a surface).
        miss0 = jnp.where(d0 > max_d, 1.0, 0.0) if t0_input else zero

        # Positions are exactly o + d*r, so the tile's whole march segment
        # lives in the box of o + [d_min, max_d] * r (its view cone).  One
        # cull evaluation per tile — the scalar interval chain runs once,
        # outside the loop, and the per-step branches test loop-invariant
        # scalars: brushes off the tile's cone are skipped for the entire
        # march (the per-tile object culling of VERDICT r2 #1, made exact).
        if culler is not None:
            r_ivs = (
                _plane_interval(rx),
                _plane_interval(ry),
                _plane_interval(rz),
            )
            o3 = (ox, oy, oz)
            seg = (jnp.min(d0), jnp.float32(max_d))
            box = ray_box(o3, r_ivs, seg)
            # Two inflations keep the box a true invariant of every point
            # the loop evaluates: the post-loop FD normals probe
            # ±normal_epsilon off hit points, and the marched positions are
            # ACCUMULATED (v += s*r, up to max_steps times) rather than
            # recomputed as o + d*r, so float drift vs the exact ray point
            # grows like max_steps * ulp * |v| (ADVICE r3: without this the
            # fixed relative pad slack in cull.pad can be outrun on long
            # marches at box boundaries).
            drift = float(max_steps) * 1.5e-7

            def _inflate(lo, hi):
                s = n_eps + drift * (jnp.abs(lo) + jnp.abs(hi) + 1.0)
                return (lo - s, hi + s)

            box = tuple(_inflate(lo, hi) for lo, hi in box)
            preds, substs = culler(box, bank, ctx)
            cone_cull = (culler.groups, preds, substs)
        else:
            cone_cull = None

        if dynamic_cull:

            def step_cull(vx, vy, vz, act):
                # Box of the ACTIVE rays' current positions (finished rays
                # sit on surfaces and would pin the box to every object
                # they hit).  The (0,0) ray's position — always a
                # previously-visited, hence valid, point — fills inactive
                # lanes so an all-done tile still produces a proper box.
                fx, fy, fz = vx[0, 0], vy[0, 0], vz[0, 0]
                on = act > 0.5
                bx = (
                    jnp.min(jnp.where(on, vx, fx)),
                    jnp.max(jnp.where(on, vx, fx)),
                )
                by = (
                    jnp.min(jnp.where(on, vy, fy)),
                    jnp.max(jnp.where(on, vy, fy)),
                )
                bz = (
                    jnp.min(jnp.where(on, vz, fz)),
                    jnp.max(jnp.where(on, vz, fz)),
                )
                preds_d, substs_d = culler((bx, by, bz), bank, ctx)
                return (culler.groups, preds_d, substs_d)

        else:
            step_cull = None

        if omega <= 1.0:
            # K micro-steps per loop iteration: the tile-exit test (a full
            # cross-lane reduction + loop branch) amortizes over K exact
            # march steps; a finished tile pays at most K-1 masked no-op
            # evals at its end.  State evolution is bit-identical to the
            # 1-step loop (masked steps change nothing; steps past
            # max_steps are gated off).
            K = unroll

            def cond(state):
                step, _, _, _, _, hit, miss = state
                return jnp.logical_and(step < max_steps, jnp.min(hit + miss) < 0.5)

            def body(state):
                step, vx, vy, vz, d, hit, miss = state
                for i in range(K):
                    if max_steps % K:
                        within = jnp.where(step + i < max_steps, 1.0, 0.0)
                        active = (1.0 - hit) * (1.0 - miss) * within
                    else:
                        active = (1.0 - hit) * (1.0 - miss)
                    if step_cull is not None:
                        s = sdf(vx, vy, vz, step_cull(vx, vy, vz, active))
                    else:
                        s = sdf(vx, vy, vz, cone_cull)
                    s = s * tol
                    new_hit = active * jnp.where(s < eps, 1.0, 0.0)
                    advance = active * (1.0 - new_hit)
                    vx = vx + advance * s * rx
                    vy = vy + advance * s * ry
                    vz = vz + advance * s * rz
                    d = d + advance * s
                    new_miss = advance * jnp.where(d > max_d, 1.0, 0.0)
                    hit = jnp.maximum(hit, new_hit)
                    miss = jnp.maximum(miss, new_miss)
                return (step + K, vx, vy, vz, d, hit, miss)

            _, vx, vy, vz, d, hit_f, miss_f = jax.lax.while_loop(
                cond, body, (jnp.int32(0), vx0, vy0, vz0, d0, hit0, miss0)
            )
        else:
            # Over-relaxed sphere tracing (Keinert et al. 2014): step by
            # omega*s; if consecutive bounding spheres stop overlapping the
            # last step may have crossed a surface — retract and drop the ray
            # to plain tracing.  Same intersections, ~25-40% fewer steps.
            prev0 = zero
            step_len0 = zero
            omg0 = zero + omega

            K = unroll

            def cond(state):
                step, _, _, _, _, hit, miss, _, _, _ = state
                return jnp.logical_and(step < max_steps, jnp.min(hit + miss) < 0.5)

            def body(state):
                step, vx, vy, vz, d, hit, miss, prev_r, step_len, omg = state
                for i in range(K):
                    if max_steps % K:
                        within = jnp.where(step + i < max_steps, 1.0, 0.0)
                        active = (1.0 - hit) * (1.0 - miss) * within
                    else:
                        active = (1.0 - hit) * (1.0 - miss)
                    if step_cull is not None:
                        s = sdf(vx, vy, vz, step_cull(vx, vy, vz, active))
                    else:
                        s = sdf(vx, vy, vz, cone_cull)
                    s = s * tol
                    sor_ok = jnp.where(jnp.abs(s) + prev_r < step_len, 0.0, 1.0)
                    sor_ok = jnp.where(omg > 1.0, sor_ok, 1.0)
                    new_hit = active * sor_ok * jnp.where(s < eps, 1.0, 0.0)
                    step_len = jnp.where(
                        active > 0.5,
                        jnp.where(sor_ok > 0.5, omg * s, step_len * (1.0 - omg)),
                        step_len,
                    )
                    omg = jnp.where(
                        active > 0.5,
                        jnp.where(sor_ok > 0.5, omg, 1.0),
                        omg,
                    )
                    advance = active * (1.0 - new_hit)
                    vx = vx + advance * step_len * rx
                    vy = vy + advance * step_len * ry
                    vz = vz + advance * step_len * rz
                    d = d + advance * step_len
                    prev_r = jnp.where(active > 0.5, jnp.abs(s), prev_r)
                    new_miss = advance * jnp.where(d > max_d, 1.0, 0.0)
                    hit = jnp.maximum(hit, new_hit)
                    miss = jnp.maximum(miss, new_miss)
                return (step + K, vx, vy, vz, d, hit, miss, prev_r, step_len, omg)

            _, vx, vy, vz, d, hit_f, miss_f, _, _, _ = jax.lax.while_loop(
                cond,
                body,
                (
                    jnp.int32(0),
                    vx0,
                    vy0,
                    vz0,
                    d0,
                    hit0,
                    miss0,
                    prev0,
                    step_len0,
                    omg0,
                ),
            )
        hit = hit_f > 0.5
        shaded = jnp.logical_and(hit, d > 0.0)

        # hit point p = o_proj + d * r_proj (k1.cl:554)
        px = ox + d * rx
        py = oy + d * ry
        pz = oz + d * rz

        # FD normal, 6 tape evals (k1.cl:381-418); the cone box was inflated
        # by n_eps so the probes stay inside the culled bound.
        gx = sdf(px + n_eps, py, pz, cone_cull) - sdf(px - n_eps, py, pz, cone_cull)
        gy = sdf(px, py + n_eps, pz, cone_cull) - sdf(px, py - n_eps, pz, cone_cull)
        gz = sdf(px, py, pz + n_eps, cone_cull) - sdf(px, py, pz - n_eps, cone_cull)
        inv = jax.lax.rsqrt(gx * gx + gy * gy + gz * gz + 1e-30)
        nx, ny, nz = gx * inv, gy * inv, gz * inv

        # Material attribution: last object within threshold (k1.cl:302-327)
        match = jnp.full(shape, -1, jnp.int32)
        lx = jnp.zeros(shape, jnp.float32)
        ly = jnp.zeros(shape, jnp.float32)
        lz = jnp.zeros(shape, jnp.float32)
        for obj in range(n_objects):
            (o3, r3, u3, f3) = bank(obj)
            dx, dy, dz = px - o3[0], py - o3[1], pz - o3[2]
            a = dx * r3[0] + dy * r3[1] + dz * r3[2]
            b = dx * u3[0] + dy * u3[1] + dz * u3[2]
            c = dx * f3[0] + dy * f3[1] + dz * f3[2]
            s = kbrushes[shape_id[obj]](a, b, c, ctx)
            is_match = s < mat_thresh
            match = jnp.where(is_match, obj, match)
            lx = jnp.where(is_match, a, lx)
            ly = jnp.where(is_match, b, ly)
            lz = jnp.where(is_match, c, lz)

        cr = jnp.zeros(shape, jnp.float32)
        cg = jnp.zeros(shape, jnp.float32)
        cb = jnp.zeros(shape, jnp.float32)
        used = sorted(set(material_id))
        for m in used:
            mr, mg, mb = kmaterials[m](px, py, pz, lx, ly, lz, nx, ny, nz, ctx)
            sel = jnp.zeros(shape, bool)
            for obj in range(n_objects):
                if material_id[obj] == m:
                    sel = jnp.logical_or(sel, match == obj)
            cr = jnp.where(sel, mr, cr)
            cg = jnp.where(sel, mg, cg)
            cb = jnp.where(sel, mb, cb)

        # Unmatched hit pixels: gizmo colors then background (k1.cl:331-377)
        sx, sy, sz = px / INITIAL_SCALE, py / INITIAL_SCALE, pz / INITIAL_SCALE

        def cyl(r2, h):
            return jnp.maximum(jnp.abs(h) - 0.5, jnp.sqrt(r2) - AXES_SHADE_RADIUS)

        no_match = match < 0
        ur = jnp.full(shape, background[0])
        ug = jnp.full(shape, background[1])
        ub = jnp.full(shape, background[2])
        for (g, rgb) in (
            (cyl(sx * sx + sy * sy, sz - 0.5), (0.0, 0.0, 1.0)),
            (cyl(sx * sx + sz * sz, sy - 0.5), (0.0, 1.0, 0.0)),
            (cyl(sy * sy + sz * sz, sx - 0.5), (1.0, 0.0, 0.0)),
        ):
            on = g < mat_thresh
            ur = jnp.where(on, rgb[0], ur)
            ug = jnp.where(on, rgb[1], ug)
            ub = jnp.where(on, rgb[2], ub)
        cr = jnp.where(no_match, ur, cr)
        cg = jnp.where(no_match, ug, cg)
        cb = jnp.where(no_match, ub, cb)

        r_out[:] = jnp.where(shaded, cr, miss_color[0])
        g_out[:] = jnp.where(shaded, cg, miss_color[1])
        b_out[:] = jnp.where(shaded, cb, miss_color[2])

    if block_layout:
        grid = (config.height // 32, config.width // 32)
    else:
        grid = (config.height // TILE_H, config.width // TILE_W)
    tile = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    if block_layout:
        # Output stored tile-major: row-block i holds 8 rows per (i, j) tile;
        # unscrambled to image layout after the kernel.
        tile = pl.BlockSpec(
            (TILE_H, TILE_W),
            lambda i, j: (i * grid[1] + j, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (grid[0] * grid[1] * TILE_H, TILE_W), jnp.float32
        )
    else:
        out_shape = jax.ShapeDtypeStruct((config.height, config.width), jnp.float32)

    @jax.jit
    def render(arrays: SceneArrays, campos, rgt, upp, fwd, t0=None):
        campos = jnp.asarray(campos, jnp.float32)
        rgt = jnp.asarray(rgt, jnp.float32)
        upp = jnp.asarray(upp, jnp.float32)
        fwd = jnp.asarray(fwd, jnp.float32)
        o_proj = jnp.stack(
            [
                jnp.sum(campos * rgt),
                jnp.sum(campos * upp),
                jnp.sum(campos * fwd),
            ]
        )
        cam = jnp.stack([o_proj, rgt, upp, fwd])  # [4, 3] SMEM scalars
        extra_specs, extra_inputs = [], []
        if t0_input:
            if t0 is None:
                raise ValueError("this renderer requires a t0 start plane")
            t0 = jnp.asarray(t0, jnp.float32)
            if block_layout:
                hb, wb = grid
                # Inverse of unscramble: image -> tile-major storage.
                t0 = (
                    t0.reshape(hb, TILE_H, 4, wb, 32)
                    .transpose(0, 3, 1, 2, 4)
                    .reshape(hb * wb * TILE_H, TILE_W)
                )
            extra_specs = [tile]
            extra_inputs = [t0]
        r, g, b = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + _bank_specs(scene)
            + extra_specs,
            out_specs=(tile, tile, tile),
            out_shape=(out_shape, out_shape, out_shape),
            interpret=interpret,
        )(cam, *_bank_inputs(arrays, scene), *extra_inputs)
        if block_layout:
            hb, wb = grid

            def unscramble(plane):
                # [(hb*wb*8), 128] -> [hb, wb, 8, 4, 32] -> [H, W]
                t = plane.reshape(hb, wb, TILE_H, 4, 32)
                return t.transpose(0, 2, 3, 1, 4).reshape(
                    config.height, config.width
                )

            r, g, b = unscramble(r), unscramble(g), unscramble(b)
        return jnp.stack([r, g, b], axis=-1)

    return render


def make_hierarchical_renderer(
    scene: CompiledScene,
    config: Optional[RenderConfig] = None,
    interpret: bool = False,
):
    """Two-pass hierarchical render: cone prepass at 1/``hierarchical_factor``
    resolution (:func:`make_pallas_cone_march`) feeds per-pixel safe start
    parameters to the fused renderer, which skips each ray's open-space
    march.  Drop-in signature match for :func:`make_pallas_renderer`.

    Hit preservation: every fine ray in an FxF block stays within
    ``t * cone_half_angle`` of the block's center ray (orthonormal frame, so
    ray deltas are uv deltas); the prepass stops while
    ``sdf >= (eps + t * cone_safety * cone_half_angle)`` still holds and
    hands back the previous visited parameter, so the skipped segment is
    epsilon-clear for the whole block."""
    if config is None:
        config = RenderConfig()
    from ..raymarch import warn_if_not_lipschitz

    warn_if_not_lipschitz(scene, "hierarchical cone prepass")
    F = config.hierarchical_factor
    assert F % 2 == 1, "hierarchical_factor must be odd (center ray exists)"
    assert config.width % F == 0 and config.height % F == 0, (
        f"viewport {config.width}x{config.height} must divide by "
        f"hierarchical_factor {F}"
    )
    w2 = config.width / 2.0
    h2 = config.height / 2.0
    half = (F - 1) / 2.0
    # Max uv distance of any covered fine ray from the block-center ray.
    cone_half_angle = half * float(np.sqrt(2.0)) / w2
    cone = make_pallas_cone_march(
        scene,
        config,
        cone_slope=config.cone_safety * cone_half_angle,
        interpret=interpret,
        strict=bool(getattr(config, "cone_strict", False)),
    )
    fine = make_pallas_renderer(
        scene, config, interpret=interpret, t0_input=True
    )
    hc, wc = config.height // F, config.width // F
    # Coarse ray through each block's center fine pixel.
    ixc = np.arange(wc) * F + half
    iyc = np.arange(hc) * F + half
    uvx_c = (ixc - w2) / w2
    uvy_c = -(iyc - h2) / w2
    uv = np.stack(
        [
            np.broadcast_to(uvx_c[None, :], (hc, wc)),
            np.broadcast_to(uvy_c[:, None], (hc, wc)),
            np.full((hc, wc), config.ifov),
        ],
        axis=-1,
    ).astype(np.float32)

    @jax.jit
    def render(arrays: SceneArrays, campos, rgt, upp, fwd):
        campos = jnp.asarray(campos, jnp.float32)
        rgt = jnp.asarray(rgt, jnp.float32)
        upp = jnp.asarray(upp, jnp.float32)
        fwd = jnp.asarray(fwd, jnp.float32)
        o_proj = jnp.stack(
            [
                jnp.sum(campos * rgt),
                jnp.sum(campos * upp),
                jnp.sum(campos * fwd),
            ]
        )
        # Projected ray component i = dot((uvx, uvy, ifov), frame_axis_i)
        # (k1.cl:506-528 — the scene lives in the projected space).
        frame = jnp.stack([rgt, upp, fwd])  # [3(axis), 3(uvz)]
        rays = jnp.einsum("hwu,iu->hwi", jnp.asarray(uv), frame)
        t_safe = cone(arrays, o_proj, rays)  # [hc, wc]
        t0 = jnp.repeat(jnp.repeat(t_safe, F, axis=0), F, axis=1)
        return fine(arrays, campos, rgt, upp, fwd, t0)

    return render
