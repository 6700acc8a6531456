"""Pose-space differentiable scene compile.

The compiled object banks (position + reciprocal frame axes,
compiler.py:322-330) are a *derived* representation: each object's
propagated transform ``M = T(position) @ R(yaw, pitch, roll) @ S(scale)``
(reference scenecompiler.py:133-135) yields

    position = M[:3, 3]
    right/up/forward = reciprocal_vector(M[:3, 0..2])   # v / ||v||^2

This module makes the derivation a two-way street:

* :func:`pose_params` decomposes a compiled scene's banks back into a
  ``{"position", "yaw", "pitch", "roll", "scale"}`` pytree (the T·R·S
  factors, under the reference's Y·X·Z euler convention);
* :func:`make_pose_to_arrays` rebuilds full ``SceneArrays`` from such a
  pytree **as a traced jnp function** — positions AND rotations/scales flow
  through the transform algebra (transforms.py with ``xp=jnp``), including
  ``reciprocal_vector`` through non-uniform scales, so gradients reach every
  pose degree of freedom (SURVEY.md §7.2 step 7: banks as a traced function
  of a params pytree).

Scope: poses parameterize each object's *propagated* (world) frame — the
flat representation the banks themselves use.  Grouping hierarchy is a
build-time concept (scene.Component.fabricate); the compiled scene, like
the reference's scene.txt, has no memory of it.  Mirrored frames (det < 0,
e.g. Logo's ``Transform.axes(x, y, -z)``) decompose as a rotation with a
negative z scale and round-trip exactly.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import transforms as tf
from .compiler import CompiledScene, SceneArrays


def _frame_matrix(arrays: SceneArrays) -> np.ndarray:
    """Recover each object's propagated 3x3 frame columns from the banks.

    The banks store reciprocal axes r = c / ||c||^2, so c = r / ||r||^2 —
    reciprocal_vector is an involution."""
    cols = []
    for bank in (arrays.right, arrays.up, arrays.forward):
        r = np.asarray(bank, np.float64)
        cols.append(r / np.maximum((r * r).sum(-1, keepdims=True), 1e-30))
    return np.stack(cols, axis=-1)  # [N, 3, 3] — columns are the frame


def pose_params(scene: CompiledScene) -> Dict[str, np.ndarray]:
    """Decompose the scene's object banks into T·R·S pose factors.

    Returns float64 arrays (matching the compiler's float64 pipeline):
    ``position`` [N, 3], ``yaw``/``pitch``/``roll`` [N], ``scale`` [N, 3].
    Round-trips: ``make_pose_to_arrays(scene)(pose_params(scene))``
    reproduces the banks (tests/test_pose.py gates this for every shipped
    design).

    Euler extraction inverts the reference's ``R = eulerY @ eulerX @
    eulerZ`` composition (scenecompiler.py:129-130; transforms.py reproduces
    the row-transpose quirks), whose product is::

        [cy*cr - sy*sp*sr,  -cy*sr - sy*sp*cr,  sy*cp]
        [cp*sr,              cp*cr,             sp   ]
        [-sy*cr - cy*sp*sr,  sy*sr - cy*sp*cr,  cy*cp]

    so pitch = asin(R[1,2]), yaw = atan2(R[0,2], R[2,2]),
    roll = atan2(R[1,0], R[1,1]); at gimbal lock (|cos pitch| ~ 0) yaw and
    roll degenerate to one degree of freedom and yaw absorbs it."""
    arrays = scene.arrays
    M = _frame_matrix(arrays)
    scale = np.linalg.norm(M, axis=1)  # column norms, [N, 3]
    # Mirrored frames (Logo's Transform.axes(x, y, -z) constructions have
    # det < 0) are not rotations; fold the reflection into a negative z
    # scale so the remaining factor is a proper rotation.
    neg = np.linalg.det(M) < 0
    scale[neg, 2] *= -1.0
    R = M / np.where(np.abs(scale[:, None, :]) > 1e-30, scale[:, None, :], 1e-30)
    pitch = np.arcsin(np.clip(R[:, 1, 2], -1.0, 1.0))
    cp = np.cos(pitch)
    locked = np.abs(cp) < 1e-8
    yaw = np.where(
        locked,
        # cp ~ 0 (sp = +-1): yaw and roll share one degree of freedom; fix
        # roll = 0, leaving R[0,0] = cos(yaw), R[2,0] = -sin(yaw)*cos(roll)
        # = -sin(yaw).
        np.arctan2(-R[:, 2, 0], R[:, 0, 0]),
        np.arctan2(R[:, 0, 2], R[:, 2, 2]),
    )
    roll = np.where(locked, 0.0, np.arctan2(R[:, 1, 0], R[:, 1, 1]))
    return {
        "position": np.asarray(arrays.position, np.float64),
        "yaw": yaw,
        "pitch": pitch,
        "roll": roll,
        "scale": scale,
    }


def make_pose_to_arrays(scene: CompiledScene) -> Callable:
    """Build ``pose_to_arrays(params) -> SceneArrays`` — a jit/grad-safe
    reconstruction of the object banks from a pose pytree.

    Every bank entry is differentiable w.r.t. every pose leaf; the integer
    structure (tape, shape/material ids) and arbitrary data are taken from
    ``scene`` unchanged (as device arrays, so brushes that index a bank
    with traced values — Logo's ad bitmask gather — trace cleanly).
    Drop-in for ``FitHarness``'s ``param_to_arrays`` (see
    :func:`pose_param_to_arrays`)."""
    base = jax.tree_util.tree_map(jnp.asarray, scene.arrays)

    def one(position, yaw, pitch, roll, scale):
        M = tf.initial(position, yaw, pitch, roll, scale, xp=jnp)
        p = M[:3, 3]
        r = tf.reciprocal_vector(M[:3, 0], xp=jnp)
        u = tf.reciprocal_vector(M[:3, 1], xp=jnp)
        f = tf.reciprocal_vector(M[:3, 2], xp=jnp)
        return p, r, u, f

    vone = jax.vmap(one)

    def pose_to_arrays(params) -> SceneArrays:
        p, r, u, f = vone(
            jnp.asarray(params["position"], jnp.float32),
            jnp.asarray(params["yaw"], jnp.float32),
            jnp.asarray(params["pitch"], jnp.float32),
            jnp.asarray(params["roll"], jnp.float32),
            jnp.asarray(params["scale"], jnp.float32),
        )
        return base.replace(
            position=p.astype(jnp.float32),
            right=r.astype(jnp.float32),
            up=u.astype(jnp.float32),
            forward=f.astype(jnp.float32),
        )

    return pose_to_arrays


def pose_param_to_arrays(scene: CompiledScene) -> Callable:
    """``param_to_arrays`` for :func:`parallel.fit.make_fit_harness`: fit in
    pose space (positions, euler angles, per-axis scales) instead of raw
    bank space — the banks stay mutually consistent by construction (raw
    position/right/up/forward leaves can drift into frames no transform
    generates)."""
    return make_pose_to_arrays(scene)
