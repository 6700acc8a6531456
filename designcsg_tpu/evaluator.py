"""Batch point evaluator — the k2 path.

Mirrors the reference's ``Evaluator`` (reference:
/root/reference/master/Evaluator.{h,cpp}): arbitrary-length point vectors are
streamed through fixed-shape jitted kernels (fixed shapes keep one XLA
executable per chunk size — the analog of the reference's fixed 256^3 staging
buffers, Evaluator.h:16).  No mutex needed: evaluation is pure.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .compiler import CompiledScene, SceneArrays
from .ops.interpreter import make_normal_fn, make_primary_sdf

# Reference chunk is 256^3 = 16.7M; a 2^20 chunk keeps per-call latency low
# while saturating the VPU.
DEFAULT_CHUNK = 1 << 20


class BatchEvaluator:
    """Chunked SDF / normal evaluation at arbitrary world points."""

    def __init__(
        self,
        scene: CompiledScene,
        arrays: Optional[SceneArrays] = None,
        chunk_size: int = DEFAULT_CHUNK,
        gizmo: bool = False,
        normal_mode: str = "fd",
        sharded: bool = False,
    ):
        self.scene = scene
        self.arrays = arrays if arrays is not None else scene.arrays
        self.chunk_size = int(chunk_size)
        sdf = make_primary_sdf(scene, gizmo=gizmo)
        normal = make_normal_fn(sdf, mode=normal_mode)
        if sharded:
            from .parallel.render import shard_pointwise

            sdf = shard_pointwise(sdf)
            normal = shard_pointwise(normal)
        self._sdf = jax.jit(sdf)
        self._normal = jax.jit(normal)
        self._device_arrays = jax.tree_util.tree_map(jnp.asarray, self.arrays)

    def set_arrays(self, arrays: SceneArrays):
        """Swap scene parameters (the reference's setArbitraryData path,
        Evaluator.cpp:213-225, generalized to all banks)."""
        self.arrays = arrays
        self._device_arrays = jax.tree_util.tree_map(jnp.asarray, arrays)

    def _run_chunked(self, fn, points: np.ndarray, out_dim: int) -> np.ndarray:
        pts = np.asarray(points, dtype=np.float32)
        n = pts.shape[0]
        out_shape = (n,) if out_dim == 1 else (n, out_dim)
        out = np.empty(out_shape, dtype=np.float32)
        cursor = 0
        while cursor < n:
            take = min(self.chunk_size, n - cursor)
            chunk = pts[cursor : cursor + take]
            if take < self.chunk_size:
                # Pad to the next power of two (>=1024) instead of the full
                # chunk — bounds the number of compiled shapes to
                # log2(chunk_size) while avoiding large padding waste.
                padded = max(1024, 1 << int(np.ceil(np.log2(take))))
                chunk = np.pad(chunk, ((0, padded - take), (0, 0)))
            result = np.asarray(fn(jnp.asarray(chunk), self._device_arrays))
            out[cursor : cursor + take] = result[:take]
            cursor += take
        return out

    def eval_sdf_at_points(self, points: np.ndarray) -> np.ndarray:
        """f32[N, 3] -> f32[N] (Evaluator.cpp:117-162 semantics)."""
        return self._run_chunked(self._sdf, points, 1)

    def eval_normal_at_points(self, points: np.ndarray) -> np.ndarray:
        """f32[N, 3] -> f32[N, 3] (Evaluator.cpp:167-211 semantics)."""
        return self._run_chunked(self._normal, points, 3)
