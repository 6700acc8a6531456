"""Mesh-export pipeline.

The reference's File->Export flow (reference:
/root/reference/master/DesignCSG.cpp:638-790): build evaluator -> bounding-box
autodetect (dense 256^3 scan) -> CMS surface extraction -> retopology ->
"gradient descent" vertex projection -> STL + PLY, with a monitor thread
rendering a stage state machine.  Here: the same stages as a pure pipeline
with a progress callback, per-slab resume caching (the reference loses the
whole <=30-min export on a crash — SURVEY.md §5.4), and dense tiled grid
evaluation instead of the octree/ISV cache.
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib
import os
import time
from typing import Callable, Optional

import numpy as np

from ..compiler import CompiledScene, ExportConfig
from ..evaluator import BatchEvaluator
from ..ops.marching_cubes import Mesh, extract_surface, refine_vertices
from . import writers


class ExportStage(enum.Enum):
    """Mirrors the reference's ExportProcessState (DesignCSG.cpp:603-614)."""

    NOT_RUNNING = enum.auto()
    ESTIMATING_BOUNDING_BOX = enum.auto()
    EXTRACTING_SURFACE = enum.auto()
    REFINING_VERTICES = enum.auto()
    WRITING_TRIANGLES = enum.auto()
    FINISHED = enum.auto()


@dataclasses.dataclass
class ExportReport:
    stage_seconds: dict
    bounding_box_center: np.ndarray
    bounding_box_half_diameter: float
    num_vertices: int
    num_triangles: int
    sdf_evals: int
    stl_path: Optional[str] = None
    ply_path: Optional[str] = None
    # Extraction telemetry (the reference's per-level triangle histogram,
    # DesignCSG.cpp:896-924): per-slab triangle counts for the uniform
    # strategies, per-octree-level counts for the adaptive strategy.
    stats: dict = dataclasses.field(default_factory=dict)

    @property
    def total_seconds(self) -> float:
        return sum(self.stage_seconds.values())


class SlabStore:
    """Per-slab resume shards: each completed extraction slab persists as an
    atomic ``.npz`` under ``directory`` keyed by (scene/config hash, z0); a
    re-run after a crash evaluates only the missing slabs.  The reference
    loses the whole <=30-min export on any crash (SURVEY.md §5.4,
    DesignCSG.cpp:638-790 — one-shot worker thread)."""

    def __init__(self, directory: str, key: str):
        self.directory = directory
        self.key = key
        os.makedirs(directory, exist_ok=True)

    def _path(self, z0: int) -> str:
        return os.path.join(self.directory, f"slab_{self.key}_{z0:06d}.npz")

    def load(self, z0: int) -> Optional[dict]:
        path = self._path(z0)
        if not os.path.exists(path):
            return None
        try:
            with np.load(path) as data:
                return {k: data[k] for k in data.files}
        except Exception:
            return None  # truncated/corrupt shard from a crash mid-write

    def save(self, z0: int, **arrays) -> None:
        path = self._path(z0)
        tmp = path + ".tmp"
        np.savez(tmp, **arrays)
        # np.savez appends .npz to names without it
        os.replace(tmp if os.path.exists(tmp) else tmp + ".npz", path)


def autodetect_bounding_box_device(
    evaluator: BatchEvaluator,
    half_diameter: float,
    resolution: int = 256,
) -> tuple[np.ndarray, float]:
    """On-device bounding-box autodetect: the Pallas grid kernel evaluates
    the scan lattice and masked coordinate min/max reductions run in the same
    jit — only 6 floats ever reach the host (the host-point path streams
    16.7M points through the tunnel).  Same semantics/quirks as
    :func:`autodetect_bounding_box`."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas import make_grid_eval

    res = int(resolution)
    cell = half_diameter / res
    lo = -cell / 2.0 - (res // 2) * cell
    eps = cell
    slab = max(1, min(64, res))
    ge = make_grid_eval(
        evaluator.scene,
        interpret=getattr(evaluator, "pallas_interpret", False),
    )
    big = jnp.float32(1e9)

    # Two separate simple programs instead of one fused pallas+reduction jit:
    # compiling a pallas call fused with full-array scalar reductions through
    # the remote compiler stalled for minutes; split, each compiles in ~1s
    # and the intermediate stays on device.
    # NB: constants built during tracing must be numpy, not jnp — a committed
    # device array captured as an MLIR constant forces a device->host pull at
    # lowering, which stalls through the axon relay.
    lo3 = np.asarray([lo, lo, lo], np.float32)
    cell32 = np.float32(cell)

    @jax.jit
    def slab_values(arrays, z0f):
        return ge(arrays, lo3, cell32, z0f, slab, res)

    @jax.jit
    def slab_reduce(vals, z0f):
        zi = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0)
        yi = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
        xi = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 2)
        x = lo + cell * xi.astype(jnp.float32)
        y = lo + cell * yi.astype(jnp.float32)
        z = lo + cell * (zi.astype(jnp.float32) + z0f)
        mask = vals < eps
        mins = jnp.stack(
            [
                jnp.where(mask, x, big).min(),
                jnp.where(mask, y, big).min(),
                jnp.where(mask, z, big).min(),
            ]
        )
        maxs = jnp.stack(
            [
                jnp.where(mask, x, -big).max(),
                jnp.where(mask, y, -big).max(),
                jnp.where(mask, z, -big).max(),
            ]
        )
        return mins, maxs

    # init at 0: the reference's accumulators start at 0 (DesignCSG.cpp:688-693)
    mins = np.zeros(3)
    maxs = np.zeros(3)
    for z0 in range(0, res, slab):
        vals = slab_values(evaluator._device_arrays, np.float32(z0))
        m, M = slab_reduce(vals, np.float32(z0))
        mins = np.minimum(mins, np.asarray(m, np.float64))
        maxs = np.maximum(maxs, np.asarray(M, np.float64))
    center = (mins + maxs) / 2.0
    diameter = float((maxs - mins).max())
    return center, diameter / 2.0


def autodetect_bounding_box(
    evaluator: BatchEvaluator,
    half_diameter: float,
    resolution: int = 256,
) -> tuple[np.ndarray, float]:
    """Dense scan of the configured volume; keep points with
    sdf < diameter/resolution, cubify the AABB (DesignCSG.cpp:666-712).

    Reference quirks kept: the scan spans ±half_diameter/2 (it treats the
    half-diameter as a diameter), points are offset by -cell/2, and the
    min/max accumulators start at 0 so the box always contains the origin.
    """
    cell = half_diameter / resolution
    idx = np.arange(-resolution // 2, resolution // 2, dtype=np.float64)
    coords = -cell / 2.0 + idx * cell
    eps = cell  # BB_EPSILON (DesignCSG.cpp:670)

    mins = np.zeros(3)
    maxs = np.zeros(3)
    # Slab over z to bound memory.
    slab = max(1, (1 << 22) // (resolution * resolution))
    for z0 in range(0, resolution, slab):
        zc = coords[z0 : z0 + slab]
        g = np.meshgrid(coords, coords, zc, indexing="ij")
        pts = np.stack([g[0].ravel(), g[1].ravel(), g[2].ravel()], axis=-1)
        vals = evaluator.eval_sdf_at_points(pts)
        interior = pts[vals < eps]
        if interior.size:
            mins = np.minimum(mins, interior.min(axis=0))
            maxs = np.maximum(maxs, interior.max(axis=0))
    center = (mins + maxs) / 2.0
    diameter = float((maxs - mins).max())
    return center, diameter / 2.0


def export_mesh(
    scene: CompiledScene,
    export_config: Optional[ExportConfig] = None,
    stl_path: Optional[str] = None,
    ply_path: Optional[str] = None,
    evaluator: Optional[BatchEvaluator] = None,
    progress: Optional[Callable[[str, float], None]] = None,
    resume_dir: Optional[str] = None,
    autodetect: bool = True,
    autodetect_resolution: int = 256,
    slab_cells: int = 32,
    sharded: bool = False,
    strategy: str = "auto",
) -> tuple[Mesh, ExportReport]:
    """Run the full export: autodetect -> extract -> refine -> write.

    ``resume_dir`` enables two-tier crash resume keyed by the scene+config
    content hash: each completed extraction *slab* persists immediately
    (:class:`SlabStore` — a crash mid-extract loses at most one slab), and
    the complete pre-refinement mesh caches as well (re-runs skip assembly).

    ``strategy`` selects the extraction dataflow: ``"active"`` ships only
    surface-active corner blocks off device (export/active.py), ``"compact"``
    ships compacted (cell config, edge t) streams — the fewest bytes
    (export/compact.py), ``"dense"`` ships whole corner slabs, ``"adaptive"``
    runs the multi-resolution octree-equivalent (export/adaptive.py,
    consuming min/max octree levels + complex_surface_threshold).
    ``"auto"`` follows the reference's behavior (its export is *always* the
    adaptive octree, DesignCSG.cpp:717-758): adaptive whenever the config's
    octree range is coherent (min < max <= grid_level) — note the fine
    lattice is then 2^maximum_octree_level, exactly like the reference's
    leaves — otherwise the uniform active/dense fast path.
    """
    config = export_config or scene.export_config or ExportConfig()
    evaluator = evaluator or BatchEvaluator(scene, sharded=sharded)
    stage_seconds: dict = {}
    stats: dict = {}
    # Record which SDF field extraction + refinement rode (VERDICT r4 #1):
    # "tape-exact" (the reference's always-exact k2 semantics),
    # "pallas-exact" (kernel twins, exact rewrites), or "pallas-baked"
    # (approximate twins — Logo's rank-32 letter fields — with the
    # declared near-surface tolerance in brush units).
    stats["sdf_field"] = getattr(evaluator, "sdf_field", "tape-exact")
    tol = getattr(evaluator, "twin_tolerance", 0.0)
    if tol:
        stats["twin_tolerance"] = tol
    evals = 0

    def _tick(stage, frac):
        if progress is not None:
            progress(stage, frac)

    if progress is not None and hasattr(progress, "attach_stats"):
        progress.attach_stats(stats)

    t0 = time.time()
    if autodetect:
        _tick(ExportStage.ESTIMATING_BOUNDING_BOX.name, 0.0)
        detect = (
            autodetect_bounding_box_device
            if getattr(evaluator, "use_pallas", False)
            else autodetect_bounding_box
        )
        center, half = detect(
            evaluator, config.bounding_box_half_diameter, autodetect_resolution
        )
        evals += autodetect_resolution**3
    else:
        center, half = np.zeros(3), config.bounding_box_half_diameter
    stage_seconds["bounding_box"] = time.time() - t0

    resolution = 1 << config.grid_level
    t0 = time.time()
    _tick(ExportStage.EXTRACTING_SURFACE.name, 0.0)

    slab = min(slab_cells, resolution)
    if strategy == "auto":
        # The reference's export is *always* the adaptive octree
        # (DesignCSG.cpp:717-758): honor a design's octree configuration
        # whenever it is coherent (a real min<max refinement range that the
        # grid resolution can support); otherwise use the uniform fast path.
        if (
            config.minimum_octree_level < config.maximum_octree_level
            and config.maximum_octree_level <= config.grid_level
        ):
            strategy = "adaptive"
        else:
            strategy = "active" if resolution % slab == 0 else "dense"

    cache_path = None
    slab_store = None
    mesh = None
    if resume_dir is not None:
        os.makedirs(resume_dir, exist_ok=True)
        key = hashlib.sha256()
        key.update(scene.arrays.content_digest())
        key.update(np.asarray(center).tobytes())
        key.update(np.float64(half).tobytes())
        key.update(np.int64(resolution).tobytes())
        # Slab payload schema differs per strategy; key shards by it.
        key.update(strategy.encode())
        key.update(np.int64(slab).tobytes())
        # Adaptive consumes the octree knobs: a changed refinement config
        # must invalidate shards (its canonical lattice depends on them).
        key.update(np.int64(config.minimum_octree_level).tobytes())
        key.update(np.int64(config.maximum_octree_level).tobytes())
        key.update(np.float64(config.complex_surface_threshold).tobytes())
        digest = key.hexdigest()[:16]
        cache_path = os.path.join(resume_dir, f"extract_{digest}.npz")
        if os.path.exists(cache_path):
            data = np.load(cache_path)
            mesh = Mesh(vertices=data["vertices"], faces=data["faces"])
        elif strategy in ("active", "dense", "compact", "adaptive"):
            # For the uniform strategies a shard is one z-slab; for adaptive
            # it is one completed octree level (a crash loses at most the
            # level in flight).
            slab_store = SlabStore(resume_dir, digest)

    if mesh is None:
        extract_progress = lambda s, f: _tick(  # noqa: E731
            ExportStage.EXTRACTING_SURFACE.name, f
        )
        if strategy == "adaptive":
            from .adaptive import extract_surface_adaptive

            evals_before = evaluator.sdf_eval_count
            mesh = extract_surface_adaptive(
                evaluator,
                center,
                half,
                config,
                progress=extract_progress,
                stats=stats,
                slab_store=slab_store,
            )
            # Adaptive's whole point is fewer evaluations than the dense
            # formula below — report what actually ran (evaluator-counted).
            evals += evaluator.sdf_eval_count - evals_before
        elif strategy == "active":
            # Active-block path (export/active.py): the per-block surface
            # mask reduces on device and only surface blocks cross the host
            # link — O(surface) transfer instead of O(volume).
            from .active import extract_surface_active

            device_mesh = None
            if sharded:
                from ..parallel.mesh import make_mesh

                device_mesh = make_mesh()
            mesh = extract_surface_active(
                evaluator,
                center,
                half,
                resolution,
                midpoint=False,
                slab_cells=slab,
                progress=extract_progress,
                device_mesh=device_mesh,
                slab_store=slab_store,
                stats=stats,
            )
        elif strategy == "compact":
            # Compacted-stream path (export/compact.py): only (cell config,
            # edge t) cross the host link — the fewest bytes per slab.
            from .compact import extract_surface_compact

            device_mesh = None
            if sharded:
                from ..parallel.mesh import make_mesh

                device_mesh = make_mesh()
            mesh = extract_surface_compact(
                evaluator,
                center,
                half,
                resolution,
                midpoint=False,
                slab_cells=slab,
                progress=extract_progress,
                device_mesh=device_mesh,
                slab_store=slab_store,
                stats=stats,
            )
        else:
            corner_provider = None
            if getattr(evaluator, "use_pallas", False):
                # Zero-host-point fast path: the Pallas grid kernel synthesizes
                # coordinates in-register; only corner values cross HBM/host.
                from ..ops.pallas import make_grid_eval

                grid_kernel = make_grid_eval(
                    evaluator.scene,
                    interpret=getattr(evaluator, "pallas_interpret", False),
                )
                lo = np.asarray(center, np.float64) - half
                cell = 2.0 * half / resolution

                def corner_provider(z0, sz):
                    return np.asarray(
                        grid_kernel(
                            evaluator._device_arrays,
                            np.asarray(lo, np.float32),
                            np.float32(cell),
                            np.float32(z0),
                            sz + 1,
                            resolution + 1,
                        )
                    )

            mesh = extract_surface(
                evaluator.eval_sdf_at_points,
                center,
                half,
                resolution,
                midpoint=False,
                slab_cells=slab_cells,
                progress=extract_progress,
                corner_provider=corner_provider,
                slab_store=slab_store,
                stats=stats,
            )
        if strategy != "adaptive":
            # Uniform strategies evaluate every corner plane once per slab
            # pass: (res+1)^2 corners x (res + res/slab) planes.
            evals += (resolution + 1) ** 2 * (
                resolution + -(-resolution // slab)
            )
        if cache_path is not None:
            np.savez(cache_path, vertices=mesh.vertices, faces=mesh.faces)
    stage_seconds["extract"] = time.time() - t0

    t0 = time.time()
    _tick(ExportStage.REFINING_VERTICES.name, 0.0)
    evals_before_refine = evaluator.sdf_eval_count
    refined = evaluator.refine_on_device(
        mesh.vertices, steps=config.gradient_descent_steps
    )
    _tick(ExportStage.REFINING_VERTICES.name, 1.0)
    mesh = Mesh(vertices=refined, faces=mesh.faces)
    evals += evaluator.sdf_eval_count - evals_before_refine
    stage_seconds["refine"] = time.time() - t0

    t0 = time.time()
    _tick(ExportStage.WRITING_TRIANGLES.name, 0.0)
    if stl_path is not None:
        writers.write_stl(stl_path, mesh)
    if ply_path is not None:
        writers.write_ply(ply_path, mesh)
    stage_seconds["write"] = time.time() - t0
    _tick(ExportStage.FINISHED.name, 1.0)

    report = ExportReport(
        stage_seconds=stage_seconds,
        bounding_box_center=center,
        bounding_box_half_diameter=half,
        num_vertices=mesh.num_vertices,
        num_triangles=mesh.num_faces,
        sdf_evals=evals,
        stl_path=stl_path,
        ply_path=ply_path,
        stats=stats,
    )
    return mesh, report
