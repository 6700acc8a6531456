"""Config dataclasses.

The reference scatters configuration across kernel #defines, header constants
and the 9-line exportConfig.txt (SURVEY.md §5.6); here every knob is an
explicit dataclass field with the reference value as default.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from . import constants as C


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Viewport semantics of kernel k1 (k1.cl:1-12,480-580)."""

    width: int = C.VIEWPORT_W
    height: int = C.VIEWPORT_H
    max_steps: int = C.MAX_STEPS
    max_distance: float = C.MAX_DISTANCE
    sdf_epsilon: float = C.SDF_EPSILON
    normal_epsilon: float = C.NORMAL_EPSILON
    march_tolerance: float = C.TOLERANCE_FACTOR_MARCHSTEP
    material_tolerance: float = C.TOLERANCE_FACTOR_MATERIAL
    ifov: float = C.IFOV
    gizmo: bool = True  # the k1-only axis gizmo; turn off for k2 semantics
    normal_mode: str = "fd"  # "fd" (reference parity) | "analytic"
    background: Tuple[float, float, float] = C.BACKGROUND_RGB
    miss_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # Reattach implicit-function-theorem gradients at the hit point so the
    # render is reverse-differentiable w.r.t. scene parameters (the march
    # itself runs under stop_gradient).  Needed for the fit harness.
    differentiable: bool = False
    # >0 enables soft-silhouette compositing (differentiable object
    # boundaries): near-miss rays fade in over this SDF bandwidth.  Interior
    # pixel values are unchanged; only boundary pixels and gradients differ.
    soft_silhouette_bandwidth: float = 0.0
    # Over-relaxed sphere tracing (Keinert et al. 2014): step by
    # march_overrelax * sdf and retract whenever consecutive bounding spheres
    # stop overlapping, which guarantees the same intersections as plain
    # sphere tracing while cutting the step count ~25-40%.  1.0 = off =
    # exact reference march semantics (the default); ~1.6 is a good fast
    # setting.  Hit points agree to sdf_epsilon, so images match the
    # reference render to sub-pixel shading differences at silhouettes.
    march_overrelax: float = 1.0
    # March engine selection: None = auto (the fused Pallas ray-march kernel
    # whenever the backend is TPU, the scene has kernel-twin brushes, and
    # march_overrelax == 1); True forces it (interpret mode off-TPU — slow,
    # for tests); False forces the jnp while_loop march.  Gradient semantics
    # are identical either way: every march runs under stop_gradient with
    # IFT/soft-silhouette reattachment, so the fit harness rides the kernel.
    use_pallas_march: Optional[bool] = None
    # Hierarchical (cone-prepass) march for the fused Pallas renderer: a
    # coarse pass at 1/hierarchical_factor resolution marches each pixel
    # block's center ray with a cone-inflated hit epsilon
    # (eps + t * cone_half_angle) * cone_safety and records the last safe
    # parameter; fine rays start there, skipping the open-space march
    # entirely.  Hits are preserved (the inflated epsilon guarantees the
    # skipped segment is at least one epsilon clear of every surface for
    # every ray in the block); hit distances agree to ~sdf_epsilon, so
    # images match to sub-pixel shading differences at silhouettes — same
    # contract as march_overrelax, composable with it.
    march_hierarchical: bool = False
    hierarchical_factor: int = 5
    # Safety multiplier on the cone slope.  The Lipschitz bound needs 1.0;
    # the margin covers SDF dips between the prepass's visited points (the
    # handoff is also one full step behind the stopping point).  Measured
    # handoff clearance at 1.2 is ~13x sdf_epsilon on the example designs
    # (tests/test_pallas.py asserts clearance at the configured value).
    cone_safety: float = 1.2
    # Per-tile exact object culling in the Pallas march (ops/pallas/cull.py):
    # scalar interval arithmetic over the tape proves which brush IMPORTs
    # cannot influence any ray in the tile's view cone and skips them.  The
    # substituted bound keeps every CSG result exact (monotone interval
    # argument), so k1 semantics and the Pallas-vs-jnp parity gates are
    # unchanged.  None (default) = off: measured on the shipped designs the
    # cull nets out neutral-to-negative — cheap-brush tapes are already at
    # the VPU issue ceiling, a live Mosaic branch costs about one cheap
    # brush eval, and in open space the nearest (unprunable) object is
    # often the expensive one (cull.worth_culling).  Opt in for scenes with
    # many expensive, spatially-separated brushes.
    march_cull: Optional[bool] = None
    # Micro-steps per march-loop iteration in the fused Pallas renderer
    # (exact semantics; the tile-exit reduction amortizes over this many
    # steps, a finished tile wastes at most unroll-1 masked evals).
    march_unroll: int = 1


# Mesh/grid extraction knobs live on compiler.ExportConfig (the reference's
# exportConfig.txt schema) — there is deliberately no second config type for
# the same concepts.
