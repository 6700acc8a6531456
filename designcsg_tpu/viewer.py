"""Interactive-ish viewport.

The reference's wxWidgets draw pane free-runs the render on idle events and
orbits with mouse drags (reference: /root/reference/master/DrawPane.cpp).
Library equivalents:

* :func:`orbit_frames` / :func:`orbit_animation` — render a camera orbit to
  frames / an animated GIF (headless-friendly).
* :func:`interactive` — a matplotlib window with drag-to-orbit and
  scroll-to-zoom wired to the same Camera math as the reference's handlers
  (needs a display).
"""

from __future__ import annotations

import time
from typing import Iterable, List, Optional

import numpy as np

from .camera import Camera
from .compiler import CompiledScene
from .config import RenderConfig


def _make_render_fn(scene: CompiledScene, config: RenderConfig, backend: str):
    import jax
    import jax.numpy as jnp

    from .ops.interpreter import as_device_arrays

    arrays = as_device_arrays(scene.arrays)
    if backend == "pallas":
        from .ops.pallas import (
            make_hierarchical_renderer,
            make_pallas_renderer,
            supports_scene,
        )

        if supports_scene(scene):
            if config.march_hierarchical:
                render = make_hierarchical_renderer(scene, config)
            else:
                render = make_pallas_renderer(scene, config)
        else:
            backend = "jnp"
    if backend == "jnp":
        from .ops.raymarch import (
            _compaction_eligible,
            make_compacted_renderer,
            make_renderer,
        )

        if _compaction_eligible(scene, config):
            # Logo-class scenes off-TPU: proxy prepass + ray compaction
            # (~3x).  _compaction_eligible (not _has_safe_proxies) so a
            # march_proxy=False opt-out and differentiable/soft-silhouette
            # configs keep the jitted full renderer (ADVICE r3).
            render = make_compacted_renderer(scene, config)
        else:
            render = jax.jit(make_renderer(scene, config))

    def run(camera: Camera):
        campos, rgt, upp, fwd = (jnp.asarray(a) for a in camera.as_arrays())
        return np.asarray(render(arrays, campos, rgt, upp, fwd))

    return run


def orbit_frames(
    scene: CompiledScene,
    n_frames: int = 24,
    config: Optional[RenderConfig] = None,
    backend: str = "jnp",
    da_total: float = 2 * np.pi,
    db: float = 0.0,
) -> List[np.ndarray]:
    """Render ``n_frames`` of a full orbit (list of f32[H, W, 3] images)."""
    if config is None:
        config = RenderConfig()
    run = _make_render_fn(scene, config, backend)
    cam = Camera.initial()
    frames = []
    for _ in range(n_frames):
        frames.append(run(cam))
        cam.orbit(da_total / n_frames, db)
    return frames


def orbit_animation(
    scene: CompiledScene,
    path: str,
    n_frames: int = 24,
    config: Optional[RenderConfig] = None,
    backend: str = "jnp",
    fps: int = 12,
) -> str:
    """Write an orbiting GIF of the scene."""
    from PIL import Image

    from .ops.raymarch import to_u8
    import jax.numpy as jnp

    frames = orbit_frames(scene, n_frames, config, backend)
    images = [Image.fromarray(np.asarray(to_u8(jnp.asarray(f)))) for f in frames]
    images[0].save(
        path,
        save_all=True,
        append_images=images[1:],
        duration=int(1000 / fps),
        loop=0,
    )
    return path


def interactive(
    scene: CompiledScene,
    config: Optional[RenderConfig] = None,
    backend: str = "jnp",
    show: bool = True,
):
    """Drag to orbit, scroll to zoom — the draw pane's mouse handlers
    (DrawPane.cpp:561-584) on a matplotlib canvas.

    Returns a session object exposing ``fig``, ``camera``, and the event
    handlers, so the viewer is drivable headlessly (``show=False`` +
    synthetic events; the Agg backend works)."""
    import matplotlib.pyplot as plt

    if config is None:
        config = RenderConfig(width=320, height=240, max_steps=128)
    run = _make_render_fn(scene, config, backend)
    cam = Camera.initial()

    fig, ax = plt.subplots()
    im = ax.imshow(np.clip(run(cam), 0, 1))
    ax.set_axis_off()
    state = {"drag": None}

    def on_press(event):
        state["drag"] = (event.x, event.y)

    def on_release(event):
        state["drag"] = None

    def on_move(event):
        if state["drag"] is None:
            return
        px, py = state["drag"]
        da = -(px - event.x) / 15.0 * (np.pi / 30.0)
        db = (py - event.y) / 15.0 * (np.pi / 30.0)
        cam.orbit(da, db)
        state["drag"] = (event.x, event.y)
        im.set_data(np.clip(run(cam), 0, 1))
        fig.canvas.draw_idle()

    def on_scroll(event):
        cam.zoom(event.step)
        im.set_data(np.clip(run(cam), 0, 1))
        fig.canvas.draw_idle()

    fig.canvas.mpl_connect("button_press_event", on_press)
    fig.canvas.mpl_connect("button_release_event", on_release)
    fig.canvas.mpl_connect("motion_notify_event", on_move)
    fig.canvas.mpl_connect("scroll_event", on_scroll)

    class _Session:
        pass

    session = _Session()
    session.fig = fig
    session.image = im
    session.camera = cam
    session.on_press = on_press
    session.on_release = on_release
    session.on_move = on_move
    session.on_scroll = on_scroll
    if show:  # pragma: no cover - needs a display
        plt.show()
    return session
