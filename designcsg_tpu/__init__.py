"""designcsg_tpu — a TPU-native differentiable CSG design framework.

Capabilities mirror mikeandike523/DesignCSG (code-first CAD: SDF brushes,
hierarchical CSG scene graph compiled to a flat tape, sphere-traced viewport,
dense-grid mesh export) re-designed for JAX/XLA/Pallas on TPU: brushes are JAX
functions, the tape stages into fused XLA programs at trace time, rendering
and voxel evaluation shard over device meshes, and everything is
differentiable end-to-end.
"""

import os as _os

# Persistent XLA compilation cache, on by default: scene programs are
# recompiled identically across processes (render shapes, export slab
# shapes), and on remote-compile backends a single heavy tape can take
# minutes to build — the cache turns that into a one-time cost (measured on
# the axon TPU relay: Design2 bbox-autodetect 69 s cold -> 8.5 s in a fresh
# process from a warm cache; steady-state dispatch unaffected).  Override the
# location with DESIGNCSG_JAX_CACHE=<dir>, disable with DESIGNCSG_JAX_CACHE=0,
# and an explicit JAX_COMPILATION_CACHE_DIR / prior jax config wins.
def _machine_fingerprint() -> str:
    """Stable per-machine tag mixed into the default cache path.

    XLA's persistent cache keys AOT results by program only; a cache
    directory shared across heterogeneous hosts (NFS home, migrated VM) can
    load CPU code compiled for a different feature set — cpu_aot_loader
    warns it "could lead to execution errors such as SIGILL".  Keying the
    *directory* by (arch, CPU flags) makes the default safe everywhere; TPU
    executables are keyed by device kind the same way.
    """
    import hashlib as _hashlib
    import platform as _platform

    tag = _platform.machine()
    try:
        with open("/proc/cpuinfo") as _fl:
            for _line in _fl:
                if _line.startswith(("flags", "Features")):
                    tag += ":" + _line
                    break
    except OSError:
        tag += ":" + _platform.processor()
    return _hashlib.sha256(tag.encode()).hexdigest()[:12]


def _probably_tpu_backend() -> bool:
    """Cheap pre-initialization guess at whether this process targets a TPU.

    The persistent cache's big win is on TPU/remote-compile backends (scene
    programs take seconds-to-minutes to build through the tunnel); on pure
    XLA:CPU it instead *loads AOT machine code*, and even same-machine loads
    trip cpu_aot_loader feature-mismatch warnings (pseudo-features like
    +prefer-no-gather aren't in the host's feature list).  Default the cache
    on only when a TPU-ish platform is plausibly in play; DESIGNCSG_JAX_CACHE
    =<dir> forces it on anywhere.
    """
    plat = _os.environ.get("JAX_PLATFORMS", "").lower()
    if plat:
        return any(p in plat for p in ("tpu", "axon", "proxy"))
    if _os.environ.get("TPU_NAME") or _os.environ.get("TPU_WORKER_ID"):
        return True
    # The axon relay injects its plugin via a sitecustomize on PYTHONPATH.
    return "axon" in _os.environ.get("PYTHONPATH", "")


try:  # pragma: no cover - best effort
    _cache_dir = _os.environ.get("DESIGNCSG_JAX_CACHE")
    if _cache_dir is None and _probably_tpu_backend():
        _cache_dir = _os.path.join(
            _os.path.expanduser("~"),
            ".cache",
            "designcsg_tpu",
            "xla-" + _machine_fingerprint(),
        )
    if _cache_dir and _cache_dir != "0" and not _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR"
    ):
        import jax as _jax

        if _jax.config.jax_compilation_cache_dir is None:
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
except Exception:
    pass

from . import api, brushes, compiler, constants, pose, scene, transforms  # noqa: F401
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
