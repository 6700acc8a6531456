"""Differentiable shape-parameter fitting (the "training" workload).

BASELINE.json config 5: pixel-loss gradients through the sphere-traced render
w.r.t. shape parameters, multi-host sharded.  The march runs under
stop_gradient with IFT gradient reattachment (ops/raymarch.py), so reverse
mode is O(1) in march steps.  Parallel layout: pixels shard over the mesh,
parameters replicate, per-shard gradients ``psum`` over ICI — XLA overlaps
the all-reduce with the backward pass (latency-hiding scheduler).

This is something the reference cannot do at all (no autodiff in OpenCL
string kernels); it is the capability the north-star statement adds.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compiler import CompiledScene, SceneArrays
from ..config import RenderConfig
from ..ops.raymarch import (
    _project,
    make_geometry_renderer,
    make_ray_renderer,
    ray_directions,
)
from .mesh import make_mesh


class FitState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def default_param_to_arrays(scene: CompiledScene) -> Callable:
    """Default reparameterization: params = {"position": f32[N,3]} swapped
    into the object banks.  For full pose-space fitting — positions, euler
    angles, and per-axis scales flowing through the transform algebra —
    pass :func:`designcsg_tpu.pose.pose_param_to_arrays(scene)` instead
    (tests/test_pose.py demonstrates rotation+scale recovery with it,
    single-device and mesh-sharded); arbitrary-data parameterizations swap
    ``ad`` the same way."""
    # Device-array base: the unchanged banks must be jnp too, or brushes
    # that INDEX a bank with traced values (Logo's ad bitmask gather) hit
    # numpy's __array__-on-tracer error under jit.
    base = jax.tree_util.tree_map(jnp.asarray, scene.arrays)

    def param_to_arrays(params) -> SceneArrays:
        return base.replace(**params)

    return param_to_arrays


@dataclasses.dataclass
class FitHarness:
    """Jitted, mesh-parallel pixel-loss fit."""

    scene: CompiledScene
    config: RenderConfig
    optimizer: optax.GradientTransformation
    param_to_arrays: Callable
    mesh: Optional[Mesh]
    step_fn: Callable
    loss_fn: Callable
    target_fn: Callable
    #: ``multi_step_fn(state, targets, camposes, rgts, upps, fwds) ->
    #: (state, loss)`` — one optimizer update against the SUM of the loss
    #: over a leading view axis (targets and camera vectors stacked
    #: [V, ...]).  Multi-view constraints restore the identifiability a
    #: single silhouette lacks (tests/test_pose.py: a rotated ellipsoid
    #: can reproduce one view, not three).
    multi_step_fn: Optional[Callable] = None

    def stack_views(self, views):
        """Stack per-view (target, campos, rgt, upp, fwd) tuples along a
        leading axis for :attr:`multi_step_fn`, targets pre-sharded (view
        axis replicated, pixel rows over the mesh)."""
        import numpy as np

        targets = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[v[0] for v in views]
        )
        if self.mesh is not None:
            rows = NamedSharding(
                self.mesh, P(None, tuple(self.mesh.axis_names))
            )
            targets = jax.tree_util.tree_map(
                lambda t: jax.device_put(t, rows), targets
            )
        cams = [
            jnp.asarray(np.stack([np.asarray(v[i]) for v in views]))
            for i in range(1, 5)
        ]
        return (targets,) + tuple(cams)

    def init(self, params) -> FitState:
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return FitState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def render_target(self, arrays, campos, rgt, upp, fwd):
        """Render the fitting target (depth+alpha tuple for the geometric
        loss, RGB image otherwise) from ground-truth arrays, pre-sharded."""
        target = self.target_fn(arrays, campos, rgt, upp, fwd)
        return self.shard_target(target)

    def shard_target(self, target):
        """Place a target (pytree of row-major images) with rows sharded
        over the mesh."""
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, target)
        sharding = NamedSharding(self.mesh, P(tuple(self.mesh.axis_names)))
        return jax.tree_util.tree_map(
            lambda t: jax.device_put(jnp.asarray(t), sharding), target
        )


def make_fit_harness(
    scene: CompiledScene,
    config: Optional[RenderConfig] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    param_to_arrays: Optional[Callable] = None,
    mesh: Optional[Mesh] = None,
    use_mesh: bool = True,
    loss: str = "geometric",
    silhouette_weight: float = 1.0,
) -> FitHarness:
    """Build the harness.  ``mesh=None, use_mesh=True`` auto-builds a 1D mesh
    over all local devices; ``use_mesh=False`` runs single-device.

    ``loss="geometric"`` (default) fits depth + soft silhouette — the
    formulation whose autodiff gradients are correct to first order (RGB
    shading has crease/material discontinuities whose boundary-integral
    gradient terms autodiff cannot see).  ``loss="rgb"`` fits raw pixels
    (useful when only appearance targets exist; expect slower, noisier
    convergence).  Targets come from :func:`FitHarness.render_target`.
    """
    if config is None:
        config = RenderConfig(
            differentiable=True, soft_silhouette_bandwidth=0.02, gizmo=False
        )
    elif not config.differentiable:
        config = dataclasses.replace(config, differentiable=True)
    if optimizer is None:
        optimizer = optax.adam(1e-2)
    if param_to_arrays is None:
        param_to_arrays = default_param_to_arrays(scene)
    if mesh is None and use_mesh:
        mesh = make_mesh()

    render_rays = make_ray_renderer(scene, config)
    render_geom = make_geometry_renderer(scene, config)
    dirs = ray_directions(config)

    def forward(params, campos, rgt, upp, fwd):
        arrays = param_to_arrays(params)
        o_proj = _project(campos, rgt, upp, fwd)
        r_proj = _project(dirs, rgt, upp, fwd)
        return render_rays(arrays, o_proj, r_proj, rgt, upp, fwd)

    def forward_geom(params, campos, rgt, upp, fwd):
        arrays = param_to_arrays(params)
        o_proj = _project(campos, rgt, upp, fwd)
        r_proj = _project(dirs, rgt, upp, fwd)
        return render_geom(arrays, o_proj, r_proj)

    sg = jax.lax.stop_gradient
    n_pixels = float(config.width * config.height)

    if loss not in ("rgb", "geometric"):
        raise ValueError(f"unknown loss {loss!r}")

    if mesh is None:
        if loss == "rgb":

            def loss_fn(params, target, campos, rgt, upp, fwd):
                img = forward(params, campos, rgt, upp, fwd)
                return jnp.mean((img - target) ** 2)

        else:

            def loss_fn(params, target, campos, rgt, upp, fwd):
                target_d, target_alpha = target
                d, alpha = forward_geom(params, campos, rgt, upp, fwd)
                both = sg(jnp.logical_and(d > 0, target_d > 0).astype(d.dtype))
                depth_term = jnp.sum(both * (d - target_d) ** 2) / jnp.maximum(
                    jnp.sum(both), 1.0
                )
                alpha_term = jnp.mean((alpha - target_alpha) ** 2)
                return depth_term + silhouette_weight * alpha_term

    else:
        # shard_map over pixel rows: each device marches its own ray block
        # with a SHARD-LOCAL early-exit cond and communicates only in the
        # final loss psums (plus their transpose — the parameter-gradient
        # all-reduce on the backward).  Sharding the same program with GSPMD
        # instead would partition the march while_loop's global all() cond
        # into a cross-device all-reduce per march iteration — hundreds of
        # rendezvous per step (and on XLA:CPU an abort risk: the in-process
        # rendezvous LOG(FATAL)s at 40 s if a partition thread starves).
        # Rows shard over ALL mesh axes jointly; psums reduce over the same
        # tuple — one program serves the 1D and ("host", "chip") layouts.
        axes = tuple(mesh.axis_names)
        P_ = P

        if loss == "rgb":

            def _local_loss(params, target_blk, o_proj, r_blk, rgt, upp, fwd):
                arrays = param_to_arrays(params)
                img = render_rays(arrays, o_proj, r_blk, rgt, upp, fwd)
                sq = jnp.sum((img - target_blk) ** 2)
                return jax.lax.psum(sq, axes) / (n_pixels * 3.0)

            local_specs = (P_(), P_(axes), P_(), P_(axes), P_(), P_(), P_())
        else:

            def _local_loss(params, target, o_proj, r_blk, rgt, upp, fwd):
                target_d, target_alpha = target
                arrays = param_to_arrays(params)
                d, alpha = render_geom(arrays, o_proj, r_blk)
                both = sg(jnp.logical_and(d > 0, target_d > 0).astype(d.dtype))
                num = jax.lax.psum(jnp.sum(both * (d - target_d) ** 2), axes)
                den = jax.lax.psum(jnp.sum(both), axes)
                asq = jax.lax.psum(jnp.sum((alpha - target_alpha) ** 2), axes)
                depth_term = num / jnp.maximum(den, 1.0)
                return depth_term + silhouette_weight * asq / n_pixels

            local_specs = (
                P_(),
                (P_(axes), P_(axes)),
                P_(),
                P_(axes),
                P_(),
                P_(),
                P_(),
            )

        sharded_loss = jax.shard_map(
            _local_loss,
            mesh=mesh,
            in_specs=local_specs,
            out_specs=P_(),
            check_vma=False,
        )

        def loss_fn(params, target, campos, rgt, upp, fwd):
            o_proj = _project(campos, rgt, upp, fwd)
            r_proj = _project(dirs, rgt, upp, fwd)
            return sharded_loss(params, target, o_proj, r_proj, rgt, upp, fwd)

    value_and_grad = jax.value_and_grad(loss_fn)

    def step_fn(state: FitState, target, campos, rgt, upp, fwd):
        loss, grads = value_and_grad(state.params, target, campos, rgt, upp, fwd)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FitState(params, opt_state, state.step + 1), loss

    def multi_loss_fn(params, targets, camposes, rgts, upps, fwds):
        # Sum over the leading view axis with lax.scan: one compiled march
        # body serves every view (V is small; unrolling would V-plicate the
        # program), and the per-view losses/gradients accumulate exactly as
        # the math says — grad distributes over the sum.
        def body(acc, view):
            tgt, cp, rg, up, fw = view
            return acc + loss_fn(params, tgt, cp, rg, up, fw), None

        total, _ = jax.lax.scan(
            body, jnp.float32(0.0), (targets, camposes, rgts, upps, fwds)
        )
        return total

    multi_value_and_grad = jax.value_and_grad(multi_loss_fn)

    def multi_step_fn(state: FitState, targets, camposes, rgts, upps, fwds):
        loss, grads = multi_value_and_grad(
            state.params, targets, camposes, rgts, upps, fwds
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FitState(params, opt_state, state.step + 1), loss

    def target_fn(arrays, campos, rgt, upp, fwd):
        o_proj = _project(campos, rgt, upp, fwd)
        r_proj = _project(dirs, rgt, upp, fwd)
        if loss == "geometric":
            return render_geom(arrays, o_proj, r_proj)
        return render_rays(arrays, o_proj, r_proj, rgt, upp, fwd)

    if mesh is not None:
        # GSPMD: rows of the target shard over the mesh; the renderer's
        # intermediates inherit that sharding; parameter gradients all-reduce
        # (XLA inserts the psum on the backward).
        repl = NamedSharding(mesh, P())
        rows = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        target_sharding = (rows, rows) if loss == "geometric" else rows
        step_jit = jax.jit(
            step_fn,
            in_shardings=(repl, target_sharding, repl, repl, repl, repl),
            out_shardings=(repl, repl),
        )
        loss_jit = jax.jit(
            loss_fn,
            in_shardings=(repl, target_sharding, repl, repl, repl, repl),
            out_shardings=repl,
        )
        vrows = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
        vtarget_sharding = (
            (vrows, vrows) if loss == "geometric" else vrows
        )
        multi_step_jit = jax.jit(
            multi_step_fn,
            in_shardings=(repl, vtarget_sharding, repl, repl, repl, repl),
            out_shardings=(repl, repl),
        )
    else:
        step_jit = jax.jit(step_fn)
        loss_jit = jax.jit(loss_fn)
        multi_step_jit = jax.jit(multi_step_fn)

    return FitHarness(
        scene=scene,
        config=config,
        optimizer=optimizer,
        param_to_arrays=param_to_arrays,
        mesh=mesh,
        step_fn=step_jit,
        loss_fn=loss_jit,
        target_fn=jax.jit(target_fn),
        multi_step_fn=multi_step_jit,
    )


def save_checkpoint(path: str, state: FitState) -> None:
    """Optimizer-state checkpointing (SURVEY.md §5.4: the reference has
    none; exports/fits restart from scratch)."""
    import pickle

    host_state = jax.tree_util.tree_map(
        lambda x: jax.device_get(x) if hasattr(x, "device") or hasattr(x, "devices") else x,
        state,
    )
    with open(path, "wb") as fl:
        pickle.dump(host_state, fl)


def load_checkpoint(path: str) -> FitState:
    import pickle

    with open(path, "rb") as fl:
        return pickle.load(fl)
