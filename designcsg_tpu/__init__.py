"""designcsg_tpu — a TPU-native differentiable CSG design framework.

Capabilities mirror mikeandike523/DesignCSG (code-first CAD: SDF brushes,
hierarchical CSG scene graph compiled to a flat tape, sphere-traced viewport,
dense-grid mesh export) re-designed for JAX/XLA/Pallas on TPU: brushes are JAX
functions, the tape stages into fused XLA programs at trace time, rendering
and voxel evaluation shard over device meshes, and everything is
differentiable end-to-end.
"""

import os as _os

# Opt-in persistent XLA compilation cache (set DESIGNCSG_JAX_CACHE=<dir>).
# Not enabled by default: the axon remote-compile plugin mishandles
# executable serialization and every jit slows ~5x with the cache on.
try:  # pragma: no cover - best effort
    _cache_dir = _os.environ.get("DESIGNCSG_JAX_CACHE")
    if _cache_dir:
        import jax as _jax

        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from . import api, brushes, compiler, constants, scene, transforms  # noqa: F401
from .brushes import Brush, EvalContext, Material  # noqa: F401
from .compiler import (  # noqa: F401
    CompiledScene,
    ExportConfig,
    SceneArrays,
    SceneCompiler,
    load_reference_scene,
)
from .scene import Component, IntersectionComponent  # noqa: F401
from .transforms import Transform  # noqa: F401

__version__ = "0.1.0"
