"""Multi-process SPMD worker (driven by tests/test_distributed.py).

Each process owns 4 virtual CPU devices; two processes form the global
8-device ("host", "chip") mesh — real multi-controller JAX, the same
runtime path a TPU pod slice uses (jax.distributed + GSPMD collectives
over the process boundary), per SURVEY.md §5.8.

Usage: python distributed_worker.py <process_id> <num_processes>
       <coordinator> <out.json>
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    coord = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from designcsg_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp

    from designcsg_tpu import api
    from designcsg_tpu.api import Transform
    from designcsg_tpu.camera import Camera
    from designcsg_tpu.config import RenderConfig
    from designcsg_tpu.parallel.fit import make_fit_harness
    from designcsg_tpu.parallel.mesh import make_mesh_2d

    # Identical tiny scene on every process (SPMD: same program everywhere).
    c = api.new_design()
    api.draw(
        api.sphere_brush(c),
        Transform.initial((0.0, 0.0, 0.0), 0.0, 0.0, 0.0, 1.2),
        compiler=c,
    )
    api.draw(
        api.box_brush(c),
        Transform.initial((0.6, 0.0, 0.0), 0.0, 0.0, 0.0, 0.5),
        compiler=c,
    )
    scene = api.commit(c)

    config = RenderConfig(
        width=32,
        height=16,
        max_steps=32,
        differentiable=True,
        soft_silhouette_bandwidth=0.02,
        gizmo=False,
    )
    campos, rgt, upp, fwd = Camera.initial().as_arrays()
    start = np.asarray(scene.arrays.position).copy()
    start[1, 0] += 0.2

    # Single-device reference (process-local math, no collectives).
    h_local = make_fit_harness(scene, config, use_mesh=False)
    target_local = h_local.render_target(scene.arrays, campos, rgt, upp, fwd)
    state_l = h_local.init({"position": jnp.asarray(start)})
    state_l, loss_local = h_local.step_fn(
        state_l, target_local, campos, rgt, upp, fwd
    )

    # Global cross-process mesh: 2 hosts x 4 chips.
    mesh = make_mesh_2d()  # hosts defaults to jax.process_count()
    assert mesh.devices.shape == (nprocs, 4)
    h = make_fit_harness(scene, config, mesh=mesh)
    target = h.render_target(scene.arrays, campos, rgt, upp, fwd)
    state = h.init({"position": jnp.asarray(start)})
    state, loss = h.step_fn(state, target, campos, rgt, upp, fwd)
    # The loss is replicated over the global mesh; every process can read
    # its addressable copy.
    loss_global = float(np.asarray(jax.device_get(loss.addressable_data(0))))
    params = state.params["position"]
    params_local = np.asarray(
        jax.device_get(params.addressable_data(0))
        if hasattr(params, "addressable_data")
        else params
    )

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_id": pid,
                "process_count": jax.process_count(),
                "global_devices": len(jax.devices()),
                "loss_global": loss_global,
                "loss_local": float(np.asarray(loss_local)),
                "params0": params_local.reshape(-1)[:6].tolist(),
            },
            f,
        )
    print("worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()
