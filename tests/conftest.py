"""Test harness configuration.

Tests run on CPU with 8 virtual devices so SPMD/sharding tests exercise real
multi-device semantics without TPU hardware (same test code runs unchanged on
a pod slice).  Must be set before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The XLA:CPU PJRT client sizes its worker pool from the processor count
# (override: PJRT_NPROC).  On a small CI host (e.g. 2 cores) an 8-virtual-
# device collective can deadlock: participant threads block the whole pool at
# the rendezvous and the remaining partitions never get a thread, so the
# 40 s rendezvous termination LOG(FATAL)s the process.  Guarantee at least
# 2 threads per virtual device.
if int(os.environ.get("PJRT_NPROC", "0") or 0) < 16:
    os.environ["PJRT_NPROC"] = "16"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in flags:
    # XLA:CPU in-process collectives LOG(FATAL) (SIGABRT, killing pytest) if
    # any partition thread is starved past the rendezvous timeout (~30 s
    # default).  On an oversubscribed CI host the 8 virtual-device sharded
    # tests can trip it; raise it — a genuine deadlock still fails via the
    # outer test timeout.
    flags = (flags + " --xla_cpu_collective_timeout_seconds=3600").strip()
os.environ["XLA_FLAGS"] = flags

# Persistent XLA compile cache for the suite.  designcsg_tpu's default
# gates the cache to TPU-ish backends (cpu_aot_loader feature-mismatch
# warnings on cross-machine cache loads), but re-JIT-compiling Design2's
# unrolled Hilbert tape costs ~10-60 s per entry point per run — measured
# 101 s of a 108 s adaptive-export test was XLA:CPU compilation.  The
# cache directory is keyed by machine fingerprint (designcsg_tpu.__init__),
# so same-machine reuse — the only kind a test run does — is safe; a
# suite run after a cold cache pays the compiles once.
os.environ.setdefault(
    "DESIGNCSG_JAX_CACHE",
    os.path.join(
        os.path.expanduser("~"), ".cache", "designcsg_tpu", "tests-cpu"
    ),
)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin (sitecustomize) force-selects jax_platforms="axon,cpu";
# override after import so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
