"""Regenerate golden render arrays (run on CPU: `python tests/make_goldens.py`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import designs
from designcsg_tpu.config import RenderConfig
from designcsg_tpu.ops.raymarch import render_scene, to_u8


def main():
    golden_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
    os.makedirs(golden_dir, exist_ok=True)
    for name in ("design1", "design2"):
        scene = designs.get_design(name)
        img = np.asarray(to_u8(render_scene(scene, config=RenderConfig(160, 120))))
        np.save(os.path.join(golden_dir, f"{name}_160x120.npy"), img)
        print("wrote", name, img.shape)


if __name__ == "__main__":
    main()
