"""Studio (application-shell) tests — driven headlessly over HTTP.

The reference's shell is a wxWidgets GUI (editor tabs, viewport, console,
file management, run/export — reference DesignCSG.cpp:331-452); the studio
serves the same capabilities over localhost HTTP, so the whole workflow is
testable with http.client: new design from template -> edit -> save -> run
-> rendered viewport -> orbit -> export with monitored progress.
"""

import http.client
import json
import os
import time

import numpy as np
import pytest

from designcsg_tpu.studio import (
    LIBRARY_BASENAME,
    NEW_DESIGN_TEMPLATE,
    StudioServer,
    Workspace,
)

TINY_DESIGN = """\
import jax.numpy as jnp
from designcsg_tpu import api
from designcsg_tpu.api import Transform

print("hello from design")
brush = api.sphere_brush()
api.draw(brush, Transform.initial((0.0, 0.0, 0.0), 0.0, 0.0, 0.0, 1.0))
api.setExportConfig(boundingBoxHalfDiameter=1.2, gridLevel=4)
api.commit()
"""


class Client:
    def __init__(self, server):
        host, port = server.server_address
        token = server.session.token

        def call(method, path, body=None, headers=None):
            conn = http.client.HTTPConnection(host, port, timeout=120)
            payload = json.dumps(body).encode() if body is not None else None
            if headers is None:
                headers = {
                    "Content-Type": "application/json",
                    "X-Studio-Token": token,
                }
            conn.request(method, path, body=payload, headers=headers)
            resp = conn.getresponse()
            data = resp.read()
            conn.close()
            return resp.status, resp.getheader("Content-Type"), data

        self.call = call

    def get(self, path):
        return self.call("GET", path)

    def json(self, method, path, body=None):
        status, _, data = self.call(method, path, body)
        return status, json.loads(data)


@pytest.fixture()
def server(tmp_path):
    srv = StudioServer(str(tmp_path / "ws"), port=0, width=64, height=48)
    srv.start_background()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_workspace_file_management(tmp_path):
    ws = Workspace(str(tmp_path / "ws"))
    # Library auto-created (the reference's second editor tab).
    assert os.path.exists(os.path.join(ws.root, LIBRARY_BASENAME))
    assert ws.list_designs() == []
    ws.new("mydesign")
    assert ws.read("mydesign") == NEW_DESIGN_TEMPLATE
    with pytest.raises(FileExistsError):
        ws.new("mydesign")
    ws.write("mydesign", "# edited\n")
    assert ws.read("mydesign") == "# edited\n"
    ws.set_last("mydesign")
    assert ws.get_last() == "mydesign"
    ws.delete("mydesign")
    assert ws.list_designs() == []
    assert ws.get_last() is None  # stale last-open filtered
    with pytest.raises(ValueError):
        ws.delete(LIBRARY_BASENAME)
    with pytest.raises(ValueError):
        ws.read("../escape")


def test_studio_end_to_end(server):
    c = Client(server)

    # Page serves.
    status, ctype, page = c.get("/")
    assert status == 200 and "text/html" in ctype and b"viewport" in page

    # New design from template, then save edited content.
    status, r = c.json("POST", "/api/new", {"name": "ball"})
    assert status == 200 and r["ok"]
    status, r = c.json("GET", "/api/design?name=ball")
    assert r["text"] == NEW_DESIGN_TEMPLATE
    c.json("POST", "/api/save", {"name": "ball", "text": TINY_DESIGN})

    # No scene yet: viewport 404s.
    status, _, _ = c.get("/render.png")
    assert status == 404

    # Run -> scene loads, design stdout lands in the console, viewport
    # renders a PNG.
    status, r = c.json("POST", "/api/run", {"name": "ball"})
    assert r["ok"]
    _, r = c.json("GET", "/api/console")
    assert any("hello from design" in line for line in r["lines"])
    status, ctype, png = c.get("/render.png")
    assert status == 200 and ctype == "image/png" and png[:4] == b"\x89PNG"

    # Last-open persistence (designPath.txt analog).
    _, r = c.json("GET", "/api/designs")
    assert r["designs"] == ["ball"] and r["last"] == "ball"

    # Orbit + zoom change the rendered frame.
    from PIL import Image
    import io as _io

    before = np.asarray(Image.open(_io.BytesIO(png)))
    c.json("POST", "/api/camera/orbit", {"da": 0.6, "db": -0.3})
    c.json("POST", "/api/camera/zoom", {"dz": 2})
    _, _, png2 = c.get("/render.png")
    after = np.asarray(Image.open(_io.BytesIO(png2)))
    assert before.shape == after.shape
    assert np.abs(before.astype(int) - after.astype(int)).max() > 0
    # Reset restores the initial pose pixel-exactly.
    c.json("POST", "/api/camera/reset")
    _, _, png3 = c.get("/render.png")
    assert np.array_equal(np.asarray(Image.open(_io.BytesIO(png3))), before)


def test_studio_script_error_survives(server):
    c = Client(server)
    c.json("POST", "/api/save", {"name": "bad", "text": "raise ValueError('boom')\n"})
    status, r = c.json("POST", "/api/run", {"name": "bad"})
    assert status == 200 and not r["ok"]
    _, r = c.json("GET", "/api/console")
    assert any("boom" in line for line in r["lines"])
    # The session survives and a good design still runs.
    c.json("POST", "/api/save", {"name": "good", "text": TINY_DESIGN})
    _, r = c.json("POST", "/api/run", {"name": "good"})
    assert r["ok"]


def test_studio_export_monitored(server, tmp_path):
    c = Client(server)
    c.json("POST", "/api/save", {"name": "ball", "text": TINY_DESIGN})
    _, r = c.json("POST", "/api/run", {"name": "ball"})
    assert r["ok"]

    stl = str(tmp_path / "out.stl")
    _, r = c.json("POST", "/api/export", {"stl": stl, "grid_level": 4})
    assert r["started"]
    deadline = time.time() + 120
    while time.time() < deadline:
        _, s = c.json("GET", "/api/export")
        if s["state"] in ("done", "failed"):
            break
        time.sleep(0.2)
    assert s["state"] == "done", s.get("error")
    assert s["triangles"] > 0 and os.path.getsize(stl) > 84
    assert "stage_seconds" in s


def test_studio_designlibrary_importable(server):
    """Design scripts can import the workspace's designlibrary module (the
    reference's second tab feeds the design script the same way)."""
    c = Client(server)
    c.json(
        "POST",
        "/api/save",
        {"name": "designlibrary", "text": "RADIUS = 0.25\n"},
    )
    design = (
        "import jax.numpy as jnp\n"
        "import designlibrary\n"
        "from designcsg_tpu import api\n"
        "from designcsg_tpu.api import Transform\n"
        "def ball(v, ctx):\n"
        "    return jnp.linalg.norm(v, axis=-1) - designlibrary.RADIUS\n"
        "b = api.define_brush(ball, name='ball')\n"
        "api.draw(b, Transform.initial((0,0,0),0.0,0.0,0.0,1.0))\n"
        "api.commit()\n"
    )
    c.json("POST", "/api/save", {"name": "libuser", "text": design})
    _, r = c.json("POST", "/api/run", {"name": "libuser"})
    assert r["ok"]


def test_studio_export_ui_contract(server):
    """The browser UI posts an empty JSON body to start an export and GETs
    the same path to poll — both must work (regression: empty body was
    treated as a poll)."""
    c = Client(server)
    c.json("POST", "/api/save", {"name": "ball", "text": TINY_DESIGN})
    _, r = c.json("POST", "/api/run", {"name": "ball"})
    assert r["ok"]
    _, r = c.json("POST", "/api/export", {"grid_level": 3})
    assert r["started"] and r["stl"].endswith("ball.stl")
    deadline = time.time() + 120
    while time.time() < deadline:
        _, s = c.json("GET", "/api/export")
        if s["state"] in ("done", "failed"):
            break
        time.sleep(0.2)
    assert s["state"] == "done", s.get("error")
    assert os.path.exists(r["stl"])


def test_studio_exact_render_toggle(server):
    """ADVICE r3: the studio viewport must offer exact k1 semantics — the
    fast default (over-relax + cone prepass) can drop thin/far features per
    config.py's safety contract, and the user needs the opt-out."""
    client = Client(server)
    session = server.session
    assert session.exact_render is False
    status, body = client.json("POST", "/api/render_mode", {"exact": True})
    assert status == 200 and body["exact"] is True
    assert session.exact_render is True
    assert float(session.config.march_overrelax) == 1.0
    assert not session.config.march_hierarchical
    # GET must not mutate (the route is POST-only, CSRF-gated)
    status, _ = client.json("GET", "/api/render_mode")
    assert status == 405
    # the UI exposes the toggle
    status, _, page = client.get("/")
    assert b"exact march" in page
    status, body = client.json("POST", "/api/render_mode", {"exact": False})
    assert status == 200 and session.exact_render is False


def test_studio_run_nothing(server):
    """Run with no design open and no text is a clean error, not a silent
    empty-scene swap."""
    c = Client(server)
    _, r = c.json("POST", "/api/run", {})
    assert r["ok"] is False and "error" in r


def test_studio_csrf_defenses(server):
    """State-changing endpoints reject cross-origin 'simple' POSTs: wrong
    content type, missing/invalid token, and mismatched Origin all fail
    cleanly without reaching the exec/filesystem paths."""
    c = Client(server)
    # No token (a cross-origin text/plain "simple" request).
    status, _, data = c.call(
        "POST", "/api/run", {"text": "open('/tmp/pwned','w')"},
        headers={"Content-Type": "text/plain"},
    )
    assert status in (403, 415)
    # JSON content type but no token.
    status, _, data = c.call(
        "POST", "/api/run", {"text": "pass"},
        headers={"Content-Type": "application/json"},
    )
    assert status == 403
    # Valid token but evil Origin.
    status, _, data = c.call(
        "POST", "/api/new", {"name": "x"},
        headers={
            "Content-Type": "application/json",
            "X-Studio-Token": server.session.token,
            "Origin": "http://evil.example",
        },
    )
    assert status == 403
    # The served page embeds the token (same-origin JS can act).
    status, ctype, page = c.get("/")
    assert status == 200 and server.session.token in page.decode()


def test_studio_bad_request_is_400(server):
    """Missing required JSON fields give a clean 4xx, not a traceback 500."""
    c = Client(server)
    status, r = c.json("POST", "/api/new", {})
    assert status == 400 and "name" in r["error"]
    status, r = c.json("POST", "/api/save", {"name": "x"})
    assert status == 400 and "text" in r["error"]


def test_studio_mutating_routes_require_post(server):
    """GET must not reach state-changing handlers (the CSRF gate runs on
    POST only — a cross-origin <img src=...> would otherwise bypass it)."""
    c = Client(server)
    status, _, _ = c.call("GET", "/api/camera/reset")
    assert status == 405
    status, _, _ = c.call("GET", "/api/run")
    assert status == 405


def test_studio_editor_syntax_highlighting(server):
    """The editor ships a CDN-free Python highlighter (the reference shell
    embeds wxStyledTextCtrl with a Python lexer, DesignCSG.cpp:403-420):
    the page carries the overlay <pre> twin and a regex literal that
    classifies comments/strings/decorators/keywords/numbers.  The pattern
    uses only syntax shared by JS and Python regexes, so we compile and
    exercise the SERVED pattern here — a regression of the string-escape
    double-decode bug (\\b arriving as backspace) fails this test."""
    import re

    client = Client(server)
    status, _, page = client.get("/")
    assert status == 200
    page = page.decode() if isinstance(page, bytes) else page
    assert 'id="hl"' in page and 'id="hlcode"' in page
    assert "function highlight(" in page
    m = re.search(r"const PY_RE = (/.*/)gm;", page)
    assert m, "highlighter regex literal missing from the served page"
    rx = re.compile(m.group(1)[1:-1], re.M)
    src = (
        'def f(x):\n    """doc"""\n    # comment\n'
        "    return x + 3.5e2 or None\n@deco\nclass A: pass\n"
    )
    kinds = {1: "comment", 2: "string", 3: "deco", 4: "kw", 5: "num"}
    got = {(kinds[mm.lastindex], mm.group(0)) for mm in rx.finditer(src)}
    expect = {
        ("kw", "def"),
        ("string", '"""doc"""'),
        ("comment", "# comment"),
        ("kw", "return"),
        ("num", "3.5e2"),
        ("kw", "or"),
        ("kw", "None"),
        ("deco", "@deco"),
        ("kw", "class"),
        ("kw", "pass"),
    }
    assert not (expect - got), expect - got
