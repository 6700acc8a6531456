"""Pallas TPU kernels — the hot compute paths.

The jnp interpreter (ops/interpreter.py) is the general, autodiff-complete
path; these kernels are the speed-of-light path for the two hot loops
(SURVEY.md §3.2/§3.5): the fused sphere-trace march and dense voxel SDF
evaluation.  They consume the same CompiledScene; scenes whose brushes lack a
registered component-wise kernel implementation fall back to jnp
transparently (``supports_scene``).
"""

from .brushes_kernel import (  # noqa: F401
    kernel_brushes_for_scene,
    register_kernel_brush,
    supports_scene,
)
from .sdf_kernel import (  # noqa: F401
    make_grid_eval,
    make_pallas_point_eval,
    make_twin_point_eval,
)
from .march_kernel import (  # noqa: F401
    make_hierarchical_renderer,
    make_pallas_cone_march,
    make_pallas_renderer,
)
