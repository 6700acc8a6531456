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


def test_preview_command(tmp_path):
    """Export then preview: the built-in answer to the reference's
    external-viewer export screenshots."""
    stl = str(tmp_path / "p.stl")
    png = str(tmp_path / "p.png")
    cli.main(["export", "design1", "--stl", stl, "--grid-level", "4"])
    cli.main(["preview", stl, png, "--size", "128"])
    from PIL import Image
    import numpy as np

    img = np.asarray(Image.open(png))
    assert img.shape == (128, 128)
    # content present: a solid object darker than the backdrop
    assert (img < 200).mean() > 0.05


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


def test_watch_rerenders_on_change(tmp_path):
    """The edit-run loop: watch re-renders when the script changes and
    survives script errors (the reference's File->Run + log.txt workflow)."""
    import threading
    import time as _time

    from designcsg_tpu.cli import main

    script = tmp_path / "d.py"
    good = (
        "from designcsg_tpu import api\n"
        "import numpy as np\n"
        "api.draw(api.sphere_brush(), api.Transform.initial(\n"
        "    position=[0,0,0], yaw=0, pitch=0, roll=0, scale=np.array([1.0]*3)))\n"
    )
    script.write_text(good)
    out = tmp_path / "w.png"

    def mutate():
        # wait for the first render, then: a broken edit, then a fix
        deadline = _time.time() + 120
        while not out.exists() and _time.time() < deadline:
            _time.sleep(0.2)
        first = out.stat().st_mtime
        script.write_text("raise RuntimeError('syntax-ish failure')\n")
        os.utime(script)
        _time.sleep(1.0)
        script.write_text(good)
        os.utime(script)

    t = threading.Thread(target=mutate)
    t.start()
    main(
        [
            "watch",
            str(script),
            "-o",
            str(out),
            "--width",
            "64",
            "--height",
            "48",
            "--poll",
            "0.2",
            "--max-renders",
            "3",
        ]
    )
    t.join()
    assert out.exists()
