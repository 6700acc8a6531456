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
    # SDF field the fit's gradient attachment evaluates (the march itself
    # rides the kernel twins on TPU regardless): "exact" = the jnp tape,
    # gradients reach every parameter incl. arbitrary data; "twin" = the
    # kernel-twin field in plain XLA — for baked-twin scenes (Logo) an
    # order-of-magnitude cheaper backward at the twins' declared tolerance,
    # pose/transform gradients only (baked tables are constants).  See
    # ops.raymarch.make_geometry_renderer.
    fit_field: str = "exact"
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
    # parameter; fine rays start there, skipping the open-space march.
    # SAFETY CONTRACT (honest version): the Lipschitz argument covers the
    # prepass's *visited* points for unit-Lipschitz SDFs only — the SDF can
    # dip between samples, rays are unnormalized (|ray| can exceed 1), and
    # a coarse miss skips the final unverified segment, so thin/far features
    # CAN drop relative to the plain march.  cone_safety=1.2 is an
    # *empirically validated heuristic*, not a proof: on the example designs
    # the measured handoff clearance is ~13x sdf_epsilon and hit-mask
    # disagreement vs the exact march is <0.2% (tests/test_pallas.py), and
    # user brushes that are not 1-Lipschitz weaken the argument further
    # (check_scene_lipschitz in ops/raymarch.py estimates this per scene).
    # Off by default; opt in for interactive speed, use the exact march for
    # final/export-grade renders.
    march_hierarchical: bool = False
    hierarchical_factor: int = 5
    # Strict cone handoff: on a coarse MISS, hand fine rays the last
    # *verified* parameter instead of the far plane, so they march the
    # prepass's final unverified segment themselves — closes the
    # thin/far-feature drop the miss shortcut can cause, at the cost of
    # background blocks marching their tails at fine resolution.
    cone_strict: bool = False
    # Safety multiplier on the cone slope (see march_hierarchical's safety
    # contract above — a heuristic margin, not a bound).
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
    # many expensive, spatially-separated brushes.  "dynamic" re-derives
    # the predicates at every march micro-step from the tile's current
    # active-ray position box (exact by the same substitution argument —
    # the box IS the evaluated points; bit-identical images, tested), built
    # for Logo-class scenes where the hoisted [t0, max_d] box never prunes.
    # Measured on v5e r4: ALSO unprofitable — the per-step scalar interval
    # chain plus live branches cost more than the skipped brushes return
    # (Logo 10.1 -> 8.5 Mrays/s, Design1 72.9 -> 14.7).  Both stay opt-in
    # as measured negative results; cull.worth_culling is the diagnostic.
    march_cull: Optional[bool] = None
    # Two-phase proxy march (jnp path): when brushes advertise a cheap
    # __proxy_fn__ LOWER bound (e.g. Logo's plate clip standing in for its
    # 3k-sample Bezier distance), phase 1 marches the proxy scene through
    # open space and phase 2 runs the full tape only from the handoff.
    # Hit-preserving (proxy <= sdf implies every sdf<eps region is also
    # proxy<eps); hit parameters agree to ~sdf_epsilon.  None = auto
    # (enabled when safe proxies exist; proxied brushes under a NEGATE
    # disable it — a lower bound flips to an upper bound there).
    march_proxy: Optional[bool] = None
    # Micro-steps per march-loop iteration in the fused Pallas kernels
    # (exact semantics: masked no-op evals past a tile's finish, steps past
    # max_steps gated off).  The while-loop's tile-exit reduction + carry
    # traffic cost ~45% of the 1-step march on v5e; amortizing them over 8
    # steps takes Design1's exact-k1 viewport from 40.5 to 74 Mrays/s
    # (plateau ~76 at 16, bit-identical images).
    march_unroll: int = 8


# Mesh/grid extraction knobs live on compiler.ExportConfig (the reference's
# exportConfig.txt schema) — there is deliberately no second config type for
# the same concepts.
