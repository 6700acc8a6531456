"""Scratch: calibrate the multi-view multi-object pose recovery test."""
import time
import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

import designs
from designcsg_tpu.camera import Camera
from designcsg_tpu.config import RenderConfig
from designcsg_tpu.parallel.fit import make_fit_harness
from designcsg_tpu.pose import make_pose_to_arrays, pose_params

design1 = designs.get_design("design1")
print("objects:", design1.num_objects)
config = RenderConfig(width=64, height=48, max_steps=128,
                      differentiable=True, soft_silhouette_bandwidth=0.02, gizmo=False)

true_pose = {k: jnp.asarray(v, jnp.float32) for k, v in pose_params(design1).items()}
to_arrays = make_pose_to_arrays(design1)

# 8 DOFs across 2 objects: sphere (1) position xy + uniform scale,
# box (2) position xz + yaw
def param_to_arrays(p):
    pose = dict(true_pose)
    pos = true_pose["position"]
    pos = pos.at[1, 0].set(p["sphere_pos"][0]).at[1, 1].set(p["sphere_pos"][1])
    pos = pos.at[2, 0].set(p["box_pos"][0]).at[2, 2].set(p["box_pos"][1])
    pose["position"] = pos
    pose["yaw"] = true_pose["yaw"].at[2].set(p["box_yaw"])
    pose["scale"] = true_pose["scale"].at[1].set(p["sphere_scale"] * jnp.ones(3, jnp.float32))
    return to_arrays(pose)

h = make_fit_harness(design1, config, param_to_arrays=param_to_arrays,
                     optimizer=optax.adam(3e-2), use_mesh=False)

cams = [Camera.initial(), Camera.initial().orbit(1.1, 0.0), Camera.initial().orbit(-0.7, 0.6)]
views = []
for cam in cams:
    campos, rgt, upp, fwd = cam.as_arrays()
    tgt = h.target_fn(jax.tree_util.tree_map(jnp.asarray, design1.arrays), campos, rgt, upp, fwd)
    views.append((tgt, campos, rgt, upp, fwd))
targets, camposes, rgts, upps, fwds = h.stack_views(views)

tp = np.asarray(true_pose["position"])
truth = {
    "sphere_pos": np.array([tp[1,0], tp[1,1]]),
    "box_pos": np.array([tp[2,0], tp[2,2]]),
    "box_yaw": float(true_pose["yaw"][2]),
    "sphere_scale": float(true_pose["scale"][1][0]),
}
start = {
    "sphere_pos": jnp.asarray(truth["sphere_pos"] + np.array([0.15, -0.12]), jnp.float32),
    "box_pos": jnp.asarray(truth["box_pos"] + np.array([-0.15, 0.1]), jnp.float32),
    "box_yaw": jnp.float32(truth["box_yaw"] + 0.2),
    "sphere_scale": jnp.float32(truth["sphere_scale"] * 0.85),
}
state = h.init(start)
t0 = time.time()
for i in range(101):
    state, loss = h.multi_step_fn(state, targets, camposes, rgts, upps, fwds)
    if i % 25 == 0:
        print(i, float(loss), f"{time.time()-t0:.1f}s")
for k in truth:
    print(k, "true", truth[k], "rec", np.asarray(state.params[k]))
