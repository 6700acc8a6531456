"""CLI and viewer/observability smoke tests (in-process)."""

import io
import os

import numpy as np
import pytest

import designs
from designcsg_tpu import cli, observability


def test_render_command(tmp_path):
    out = str(tmp_path / "r.png")
    cli.main(
        [
            "render",
            "design1",
            "-o",
            out,
            "--width",
            "64",
            "--height",
            "48",
        ]
    )
    from PIL import Image

    img = Image.open(out)
    assert img.size == (64, 48)


def test_render_design_script_by_path(tmp_path):
    script = tmp_path / "mydesign.py"
    script.write_text(
        "import numpy as np\n"
        "from designcsg_tpu import api\n"
        "from designcsg_tpu.api import Transform, draw\n"
        "draw(api.sphere_brush(), Transform.initial(position=[0,0,0], yaw=0,\n"
        "     pitch=0, roll=0, scale=np.array([1.0]*3)))\n"
    )
    out = str(tmp_path / "s.png")
    cli.main(["render", str(script), "-o", out, "--width", "64", "--height", "48"])
    assert os.path.exists(out)


def test_export_command(tmp_path):
    stl = str(tmp_path / "d1.stl")
    cli.main(["export", "design1", "--stl", stl, "--grid-level", "4"])
    assert os.path.getsize(stl) > 84


def test_artifacts_command(tmp_path):
    cli.main(["artifacts", "design2", "-d", str(tmp_path)])
    golden = open("/root/reference/master/buildprocedure.txt").read().strip()
    ours = (tmp_path / "buildprocedure.txt").read_text().strip()
    assert ours == golden


def test_orbit_frames():
    from designcsg_tpu.config import RenderConfig
    from designcsg_tpu.viewer import orbit_frames

    scene = designs.get_design("design1")
    frames = orbit_frames(
        scene, n_frames=3, config=RenderConfig(width=64, height=48, max_steps=64)
    )
    assert len(frames) == 3
    # camera moved: frames differ
    assert np.abs(frames[0] - frames[1]).max() > 1e-3


def test_stage_timer_and_monitor():
    timer = observability.StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    report = timer.report()
    assert "a" in report and "total" in report

    buf = io.StringIO()
    monitor = observability.ExportMonitor(out=buf, min_interval=0.0)
    monitor("EXTRACTING_SURFACE", 0.5)
    monitor("EXTRACTING_SURFACE", 1.0)
    assert "EXTRACTING_SURFACE" in buf.getvalue()
    assert "100.0%" in buf.getvalue()
