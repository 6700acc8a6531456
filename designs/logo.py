"""Logo — extruded TrueType letters ("CSG") on three cube faces.

Port of the reference's arbitrary-data showcase
(reference: /root/reference/master/Designs/Logo.py): glyph outlines are
extracted with fontTools as quadratic Bezier segments, per-letter
inside/outside bitmasks are packed 16-bits-per-float into the arbitrary-data
array, and the brush evaluates curve distance + sign-from-bitmask *reading
everything from ctx.ad* — exercising the AD path end-to-end (and making the
outlines differentiable parameters, which the reference cannot).

The reference ships CourierPrime-Bold; this port defaults to matplotlib's
DejaVuSansMono-Bold (same capability, no dependency on the read-only
reference mount) and accepts any TTF path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from designcsg_tpu import api
from designcsg_tpu.api import Transform
from designcsg_tpu.constants import MAX_DISTANCE

LETTER_RESOLUTION = 64
SUBSEGMENTS = 64
THICKNESS = 0.075

# Baked-field kernel twin parameters (see _bake_letter_tables): the letter
# brush is z-extruded, so its expensive part is a static 2D field of the
# glyph; a weighted rank-BAKE_RANK factorization over a BAKE_RES^2 grid
# of [-BAKE_L, BAKE_L]^2 is what the Pallas march samples in-kernel.
BAKE_RES = 128
BAKE_RANK = 32
BAKE_L = 1.4
_BAKE_CACHE: dict = {}


def _default_font() -> str:
    # The reference design's own font (CourierPrime-Bold, SIL OFL) when its
    # tree is mounted — glyph outlines then match the published render
    # exactly; any monospace bold is a reasonable stand-in otherwise.
    ref_font = "/root/reference/master/Designs/CourierPrime-Bold.ttf"
    if os.path.exists(ref_font):
        return ref_font
    import matplotlib

    return os.path.join(
        os.path.dirname(matplotlib.__file__),
        "mpl-data",
        "fonts",
        "ttf",
        "DejaVuSansMono-Bold.ttf",
    )


def _cache_dir() -> Optional[str]:
    """Disk cache for build-time derived data (glyph decompositions, baked
    factor tables).  Both are pure functions of file/scene content and cost
    seconds per process (4225 PointInsidePen queries per glyph; the
    weighted-ALS bake) — the cache makes every process after the first
    cheap.  Disable with DESIGNCSG_BUILD_CACHE=0."""
    root = os.environ.get("DESIGNCSG_BUILD_CACHE")
    if root == "0":
        return None
    if not root:
        root = os.path.join(
            os.path.expanduser("~"), ".cache", "designcsg_tpu", "build"
        )
    try:
        os.makedirs(root, exist_ok=True)
        return root
    except OSError:
        return None


_GLYPH_CACHE: dict = {}


def _glyph_segments_and_mask(font, letter: str):
    key = (getattr(font.reader.file, "name", id(font)), letter, LETTER_RESOLUTION)
    if key in _GLYPH_CACHE:
        return _GLYPH_CACHE[key]
    cache = _cache_dir()
    disk_key = None
    if cache is not None and isinstance(key[0], str):
        import hashlib

        try:
            with open(key[0], "rb") as fh:
                font_digest = hashlib.sha256(fh.read()).hexdigest()[:16]
            disk_key = os.path.join(
                cache, f"glyph-{font_digest}-{ord(letter)}-{LETTER_RESOLUTION}.npz"
            )
            if os.path.exists(disk_key):
                with np.load(disk_key) as z:
                    out = (z["segments"].reshape(-1, 3, 2).tolist(), z["bits"])
                    out = (
                        [tuple(map(tuple, seg)) for seg in out[0]],
                        out[1],
                    )
                    _GLYPH_CACHE[key] = out
                    return out
        except OSError:
            disk_key = None
    out = _glyph_segments_and_mask_uncached(font, letter)
    _GLYPH_CACHE[key] = out
    if disk_key is not None:
        try:
            tmp = disk_key + f".tmp{os.getpid()}.npz"
            np.savez(
                tmp,
                segments=np.asarray(out[0], np.float64).reshape(-1, 6),
                bits=out[1],
            )
            os.replace(tmp, disk_key)
        except OSError:
            pass
    return out


def _glyph_segments_and_mask_uncached(font, letter: str):
    """Quadratic segments (rescaled to [-1,1]^2) + (R+1)^2 inside bitmask.

    TrueType outlines are quadratic B-splines with implied on-curve midpoints
    between consecutive off-curve points; lines become degenerate quadratics
    with B = midpoint(A, C) — the same decomposition the reference's
    InterceptorPen performs (Logo.py:109-177)."""
    from fontTools.pens.pointInsidePen import PointInsidePen
    from fontTools.pens.recordingPen import RecordingPen

    cmap = font.getBestCmap()
    glyph_set = font.getGlyphSet()
    glyph = glyph_set[cmap[ord(letter)]]

    pen = RecordingPen()
    glyph.draw(pen)

    # Bounds for rescaling to [-1, 1]^2 (Logo.py:48-65).
    points = []
    for op, args in pen.value:
        for pt in args:
            if pt is not None:
                points.append(pt)
    pts = np.asarray(points, dtype=np.float64)
    mn, mx = pts.min(axis=0), pts.max(axis=0)

    def rescale(p):
        return (
            -1.0 + 2.0 * (p[0] - mn[0]) / (mx[0] - mn[0]),
            -1.0 + 2.0 * (p[1] - mn[1]) / (mx[1] - mn[1]),
        )

    def inv_rescale(p):
        return (
            mn[0] + (mx[0] - mn[0]) * (p[0] + 1.0) / 2.0,
            mn[1] + (mx[1] - mn[1]) * (p[1] + 1.0) / 2.0,
        )

    segments = []
    current = (0.0, 0.0)
    path_start = current

    def add_line(a, c):
        b = ((a[0] + c[0]) / 2.0, (a[1] + c[1]) / 2.0)
        segments.append((a, b, c))

    for op, args in pen.value:
        if op == "moveTo":
            current = rescale(args[0])
            path_start = current
        elif op == "lineTo":
            nxt = rescale(args[0])
            add_line(current, nxt)
            current = nxt
        elif op == "qCurveTo":
            pts_q = list(args)
            if pts_q[-1] is None:
                raise ValueError("all-off-curve qCurveTo not supported")
            if len(pts_q) == 1:  # degenerate: behaves as a line
                nxt = rescale(pts_q[0])
                add_line(current, nxt)
                current = nxt
            else:
                # on-curve start, off-curve points with implied on-curve
                # midpoints between consecutive off-points, explicit end.
                start_on = current
                for i in range(len(pts_q) - 1):
                    off = rescale(pts_q[i])
                    if i < len(pts_q) - 2:
                        nxt_off = rescale(pts_q[i + 1])
                        on = (
                            (off[0] + nxt_off[0]) / 2.0,
                            (off[1] + nxt_off[1]) / 2.0,
                        )
                    else:
                        on = rescale(pts_q[-1])
                    segments.append((start_on, off, on))
                    start_on = on
                current = rescale(pts_q[-1])
        elif op == "curveTo":
            # cubic (CFF fonts): approximate with two quadratics via midpoint
            c1, c2, end = (rescale(p) for p in args[-3:])
            add_line(current, c1)
            add_line(c1, c2)
            add_line(c2, end)
            current = end
        elif op == "closePath":
            if current != path_start:
                add_line(current, path_start)
            current = path_start

    # Inside/outside lattice (Logo.py:332-343): border forced outside.
    r = LETTER_RESOLUTION
    bits = np.zeros(((r + 1) * (r + 1),), dtype=np.int64)
    idx = 0
    for row in range(r + 1):
        for col in range(r + 1):
            y = 1.0 - 2.0 * row / r
            x = -1.0 + 2.0 * col / r
            if row in (0, r) or col in (0, r):
                inside = 0
            else:
                pen_in = PointInsidePen(glyph_set, inv_rescale((x, y)))
                glyph.draw(pen_in)
                inside = 1 if pen_in.getResult() else 0
            bits[idx] = inside
            idx += 1
    return segments, bits


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """16 bits per float, MSB first (Logo.py:86-99)."""
    out = []
    for start in range(0, len(bits), 16):
        chunk = bits[start : start + 16]
        value = 0
        for bit in chunk:
            value = value * 2 + int(bit)
        value <<= 16 - len(chunk)
        out.append(float(value))
    return np.asarray(out, dtype=np.float32)


def _curve_samples_np(segments) -> np.ndarray:
    """The brush's Bezier sample points, in numpy (bake-time twin of the
    jnp sampling in _make_letter_brush: same t grid, same decomposition)."""
    t = (np.arange(SUBSEGMENTS, dtype=np.float64) / SUBSEGMENTS)[:, None]
    pts = []
    for (a, b, c) in segments:
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        c = np.asarray(c, np.float64)
        pts.append((1 - t) * ((1 - t) * a + t * b) + t * ((1 - t) * b + t * c))
    return np.concatenate(pts, axis=0)


def _bake_field(samples: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """The continuous letter field b = sigma*d - thickness on the bake grid.

    ``d`` is the brush's min distance to the Bezier samples; ``sigma`` is
    the sign from the packed inside/outside bitmask with the brush's exact
    lattice-snapping semantics (reference Logo.py:263-275).  Unlike the
    brush's ``inside ? -d : d-thickness`` (which jumps by ``thickness``
    across the outline), ``sigma*d - thickness`` is continuous and
    1-Lipschitz with the SAME values everywhere the march can see (the
    two differ only strictly inside the rendered solid), so it is the
    right field to approximate."""
    n, L, r = BAKE_RES, BAKE_L, LETTER_RESOLUTION
    xs = np.linspace(-L, L, n)
    X, Y = np.meshgrid(xs, xs, indexing="xy")
    P = np.stack([X.ravel(), Y.ravel()], -1)
    d2min = np.full(P.shape[0], np.inf)
    for s0 in range(0, samples.shape[0], 512):
        chunk = samples[s0 : s0 + 512]
        d2 = ((P[:, None, :] - chunk[None, :, :]) ** 2).sum(-1)
        d2min = np.minimum(d2min, d2.min(axis=1))
    d = np.sqrt(d2min).reshape(n, n)
    bits2 = bits.reshape(r + 1, r + 1)
    qc = (r * (X + 1.0) / 2.0).astype(np.int64)  # trunc-toward-zero, as the brush
    qr = r - (r * (Y + 1.0) / 2.0).astype(np.int64)
    in_range = (qc >= 0) & (qc <= r) & (qr >= 0) & (qr <= r)
    inside = in_range & (bits2[np.clip(qr, 0, r), np.clip(qc, 0, r)] == 1)
    return np.where(inside, -d, d) - THICKNESS  # rows = y, cols = x


def _weighted_lowrank(B: np.ndarray, K: int):
    """Rank-K factorization B ~= Uy @ Vx, accuracy concentrated near the
    zero set (where march hits, hit tests and FD normals live) by weighted
    alternating least squares, with two safety guards re-weighted in:

    * no phantom surfaces: where B is clearly positive the approximation
      must stay clearly positive (an undershoot below the hit epsilon
      would light pixels off the glyph);
    * bounded overshoot: approx <= B + ~0.04 everywhere, so a march step
      can land at most ~0.04 past the true safe distance — far below the
      >=0.15 thickness of any letter feature, hence no tunneling (the
      over-step lands epsilon-inside and still registers the hit)."""
    near = np.abs(B) < 0.15
    W = np.where(near, 1.0, 0.08)
    U0, S0, Vt0 = np.linalg.svd(B)
    Uy = U0[:, :K] * S0[:K]
    Vx = Vt0[:K].copy()
    eye = 1e-8 * np.eye(K)
    for round_ in range(4):
        for _ in range(8):
            for i in range(B.shape[0]):
                A = Vx * W[i][None, :]
                Uy[i] = np.linalg.solve(A @ A.T + eye, A @ (B[i] * W[i]))
            for j in range(B.shape[1]):
                w = W[:, j]
                A = Uy.T * w[None, :]
                Vx[:, j] = np.linalg.solve(A @ A.T + eye, A @ (B[:, j] * w))
        approx = Uy @ Vx
        bad = (B > 0.1) & (approx < 0.06)
        bad |= (approx - B) > 0.04
        if not bad.any():
            break
        W[bad] = np.maximum(W[bad] * 8.0, 1.0)
    return Uy, Vx


def _bake_letter_tables(segments, bits) -> np.ndarray:
    """Packed (4K, 128) f32 factor tables for the in-kernel sampler
    (ops/pallas/table.py::packed_rank_sample): x-factor values UA and
    forward-difference slopes US, then y-factor values VA and slopes VS.
    Pure numpy at scene-build time (the factorization is a host-side
    solve, not a per-frame device computation); cached by glyph content."""
    import hashlib

    samples = _curve_samples_np(segments)
    key = hashlib.sha256(
        b"".join(
            [
                samples.tobytes(),
                bits.tobytes(),
                np.float64([BAKE_RES, BAKE_RANK, BAKE_L, THICKNESS]).tobytes(),
            ]
        )
    ).hexdigest()
    if key in _BAKE_CACHE:
        return _BAKE_CACHE[key]
    cache = _cache_dir()
    disk_key = (
        os.path.join(cache, f"bake-{key[:24]}.npy") if cache is not None else None
    )
    if disk_key is not None and os.path.exists(disk_key):
        try:
            tbl = np.load(disk_key)
            _BAKE_CACHE[key] = tbl
            return tbl
        except (OSError, ValueError):
            pass
    B = _bake_field(samples, bits)
    Uy, Vx = _weighted_lowrank(B, BAKE_RANK)
    UA = Vx.astype(np.float32)  # x factors, (K, 128)
    VA = Uy.T.astype(np.float32)  # y factors, (K, 128)
    US = np.zeros_like(UA)
    US[:, :-1] = UA[:, 1:] - UA[:, :-1]
    VS = np.zeros_like(VA)
    VS[:, :-1] = VA[:, 1:] - VA[:, :-1]
    tbl = np.concatenate([UA, US, VA, VS], axis=0)
    _BAKE_CACHE[key] = tbl
    if disk_key is not None:
        try:
            tmp = disk_key + f".tmp{os.getpid()}.npy"
            np.save(tmp, tbl)
            os.replace(tmp, disk_key)
        except OSError:
            pass
    return tbl


def _make_letter_twin(table_name: str):
    """Component-wise Pallas twin of the letter brush: samples the baked
    rank-factored field instead of reducing over ~3k Bezier samples (which
    Mosaic's vector layouts cannot express — BASELINE.md roofline).  Values
    match the jnp brush to the bake's near-surface tolerance (~7e-3 in
    letter units, sub-pixel at the viewport) everywhere the march and
    shading evaluate; the plate clip and slab stay exact."""
    GS = (BAKE_RES - 1) / (2.0 * BAKE_L)

    def twin(a, b, c, ctx):
        from designcsg_tpu.ops.pallas.table import packed_rank_sample

        x, y, z = 2.0 * a, 2.0 * b, 2.0 * c
        gx = (x + BAKE_L) * GS
        gy = (y + BAKE_L) * GS
        bs = packed_rank_sample(
            ctx.extras[table_name],
            gx,
            gy,
            # Plain-XLA tape composition (make_twin_point_eval) sets this
            # trace-time flag: XLA takes one full-batch gather; Mosaic
            # needs the per-vreg chunked form.
            chunked=not ctx.extras.get("__xla_tape__", False),
        )
        # Beyond the bake domain the clamped sample is stale; the true
        # sample distance is at least the distance to the domain rectangle
        # (all Bezier samples lie inside it), a bound that grows linearly
        # so far-field march steps stay long.
        ex = jnp.maximum(jnp.abs(x) - BAKE_L, 0.0)
        ey = jnp.maximum(jnp.abs(y) - BAKE_L, 0.0)
        # The epsilon keeps sqrt differentiable at ex=ey=0 (inside the bake
        # domain): sqrt'(0) is inf, and inf * the max-branch's zero
        # cotangent poisons reverse mode with NaN (fit_field="twin").
        # Value change is < 1e-15 — invisible to f32.
        bs = jnp.maximum(
            bs, jnp.sqrt(ex * ex + ey * ey + 1e-30) - THICKNESS
        )
        box = jnp.maximum(
            jnp.abs(x) - 1.25, jnp.maximum(jnp.abs(y) - 1.25, jnp.abs(z) - 1.25)
        )
        slab = jnp.abs(z - 1.25) - 0.125
        return jnp.maximum(jnp.maximum(bs, box), slab)

    return twin


def _register_letter_interval(letter_fn, samples: np.ndarray):
    """Sound interval twin for the per-tile cull (ops/pallas/cull.py).

    Lower bound: the brush is max(signed, box, slab) >= max(box, slab) —
    exact Chebyshev distance to the plate, growing with distance (what
    lets far tiles prune the letter).  Upper bound: signed <= d - thickness
    <= |p2d - s_a| - thickness for any fixed curve sample s_a; min over a
    spread of anchors keeps it usefully tight."""
    from designcsg_tpu.ops.pallas import cull as _cull

    step = max(1, samples.shape[0] // 12)
    anchors = np.asarray(samples[::step][:12], np.float32)

    def _iv(ia, ib, ic, ctx):
        x2 = _cull.iv_mul_scalar(ia, 2.0)
        y2 = _cull.iv_mul_scalar(ib, 2.0)
        z2 = _cull.iv_mul_scalar(ic, 2.0)
        box = _cull.iv_sub(
            _cull.iv_max(
                _cull.iv_abs(x2),
                _cull.iv_max(_cull.iv_abs(y2), _cull.iv_abs(z2)),
            ),
            _cull.iv_const(1.25),
        )
        slab = _cull.iv_sub(
            _cull.iv_abs(_cull.iv_sub(z2, _cull.iv_const(1.25))),
            _cull.iv_const(0.125),
        )
        clip = _cull.iv_max(box, slab)
        d_hi = None
        for ax, ay in anchors:
            dx = _cull.iv_sub(x2, _cull.iv_const(float(ax)))
            dy = _cull.iv_sub(y2, _cull.iv_const(float(ay)))
            hi = _cull.iv_sqrt(
                _cull.iv_add(_cull.iv_square(dx), _cull.iv_square(dy))
            )[1]
            d_hi = hi if d_hi is None else jnp.minimum(d_hi, hi)
        # Inside the glyph the brush returns a *negative* signed distance
        # (-d), not d - THICKNESS, so d_hi - THICKNESS alone undercuts the
        # true value by up to ~THICKNESS/2 near anchor samples (ADVICE r4).
        # Clamping the signed upper bound at 0 is sound for both branches:
        # inside values are <= 0, outside values are <= d_hi - THICKNESS.
        signed_hi = jnp.maximum(d_hi - THICKNESS, 0.0)
        return (clip[0], jnp.maximum(signed_hi, clip[1]))

    _iv.__anchors__ = anchors  # targeted-fuzz hook (tests/test_pallas.py)
    _cull.INTERVAL_BRUSHES[letter_fn] = _iv


def _make_letter_brush(curve_start: int, n_curves: int, mask_start: int):
    """Brush reading curve data + bitmask from ctx.ad (the getAD path)."""
    r = LETTER_RESOLUTION

    def letter_fn(v, ctx):
        ad = ctx.ad
        v = 2.0 * v
        x, y, z = v[..., 0], v[..., 1], v[..., 2]

        # Curve samples: [n_curves, SUBSEGMENTS, 2] from AD (differentiable).
        stride = 11
        offs = curve_start + stride * np.arange(n_curves)[:, None]
        a = jnp.stack([ad[offs + 0], ad[offs + 1]], axis=-1)  # [C,1,2]
        b = jnp.stack([ad[offs + 3], ad[offs + 4]], axis=-1)
        c = jnp.stack([ad[offs + 6], ad[offs + 7]], axis=-1)
        t = (np.arange(SUBSEGMENTS, dtype=np.float32) / SUBSEGMENTS)[None, :, None]
        samples = (1 - t) * ((1 - t) * a + t * b) + t * ((1 - t) * b + t * c)
        samples = samples.reshape(-1, 2)  # [C*S, 2]
        thickness = ad[curve_start + 9]

        # min_j |p - s_j|^2 = (x^2 + y^2) + min_j (-2 s_j . p + |s_j|^2):
        # the min of affine functions of p — evaluated as chunked matmuls
        # (MXU) with a running min, instead of materializing the
        # [pixels, C*S, 2] broadcast difference (memory-bound; dominated
        # the Logo render).  Identical values up to FMA rounding;
        # differentiable w.r.t. the AD-derived samples throughout.
        sx, sy = samples[:, 0], samples[:, 1]
        ns = sx.shape[0]
        CH = 256
        pad = (-ns) % CH
        big = jnp.float32(3.0e37)
        aff = jnp.stack(
            [
                jnp.concatenate([-2.0 * sx, jnp.zeros(pad, sx.dtype)]),
                jnp.concatenate([-2.0 * sy, jnp.zeros(pad, sy.dtype)]),
                jnp.concatenate([sx * sx + sy * sy, jnp.full(pad, big)]),
            ],
            axis=0,
        )  # [3, NSpad]
        P = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)  # [..., 3]
        chunks = aff.reshape(3, -1, CH).transpose(1, 0, 2)  # [nch, 3, CH]

        def chunk_min(m, Bc):
            vals = jnp.einsum(
                "...k,kc->...c", P, Bc, precision=jax.lax.Precision.HIGH
            )  # TPU matmuls default to single-pass bf16, whose error near
            # the glyph would rival THICKNESS; HIGH (3-pass bf16) restores
            # ~f32 accuracy at a fraction of HIGHEST's cost
            return jnp.minimum(m, vals.min(axis=-1)), None

        m0 = jnp.full(x.shape, big, dtype=x.dtype)
        m, _ = jax.lax.scan(chunk_min, m0, chunks)
        d = jnp.sqrt(jnp.maximum(x * x + y * y + m, 0.0))

        # Sign from the packed bitmask (Logo.py:263-275).
        query_col = (r * (x + 1.0) / 2.0).astype(jnp.int32)
        query_row = r - (r * (y + 1.0) / 2.0).astype(jnp.int32)
        in_range = (
            (query_col >= 0) & (query_col <= r) & (query_row >= 0) & (query_row <= r)
        )
        bit_position = query_row * (r + 1) + query_col
        bit_position = jnp.clip(bit_position, 0, (r + 1) * (r + 1) - 1)
        foffs = bit_position // 16
        soffs = bit_position % 16
        shortval = ad[mask_start + foffs].astype(jnp.int32)
        bit = jnp.right_shift(shortval, 15 - soffs) & 1
        inside = in_range & (bit == 1)

        signed = jnp.where(inside, -d, d - thickness)

        # Clip to the letter plate: unit-ish box and a thin z slab
        # (Logo.py:314).
        box = jnp.maximum(
            jnp.abs(x) - 1.25, jnp.maximum(jnp.abs(y) - 1.25, jnp.abs(z) - 1.25)
        )
        slab = jnp.abs(z - 1.25) - 0.125
        return jnp.maximum(jnp.maximum(signed, box), slab)

    def plate_proxy(v, ctx):
        # Exact LOWER bound of letter_fn: the full brush is
        # max(signed, box, slab) >= max(box, slab).  Drives the two-phase
        # proxy march (ops/raymarch.py): open-space steps never evaluate
        # the Bezier sample loop.
        v = 2.0 * v
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        box = jnp.maximum(
            jnp.abs(x) - 1.25, jnp.maximum(jnp.abs(y) - 1.25, jnp.abs(z) - 1.25)
        )
        slab = jnp.abs(z - 1.25) - 0.125
        return jnp.maximum(box, slab)

    letter_fn.__proxy_fn__ = plate_proxy
    return letter_fn


def _letter_component(c, font, letter: str, transform, index: int):
    segments, bits = _glyph_segments_and_mask(font, letter)
    curvedata = []
    for (a, b, cc) in segments:
        curvedata.extend([a[0], a[1], 0.0, b[0], b[1], 0.0, cc[0], cc[1], 0.0])
        curvedata.append(THICKNESS)
        curvedata.append(0.0)  # axesTag AXES_XY
    mask_start = c.add_arbitrary_data(f"LETTER_OFFS_{letter}", _pack_bits(bits))
    c.add_arbitrary_data(f"NUMCURVES_{letter}", [float(len(segments))])
    curve_start = c.add_arbitrary_data(f"CURVEDATA_{letter}", curvedata)
    letter_fn = _make_letter_brush(curve_start, len(segments), mask_start)

    # Pallas fast path: a baked rank-factored field of THIS glyph, sampled
    # in-kernel (see _bake_letter_tables).  The bake happens here at build
    # time from the same concrete curve/bitmask data the AD is packed from;
    # an edited design rebuilds the scene and hence re-bakes.  The jnp
    # brush above stays the exact/differentiable reference: fit gradients,
    # every off-TPU evaluation, AND (since r5) TPU exports/point batches
    # use it by default — __twin_approx__ below makes BatchEvaluator's
    # auto rule prefer the exact tape, which is both the reference's
    # always-exact k2 semantics and measurably faster for bulk points
    # (the MXU runs the Bezier-sample matmuls; the twin kernel is a
    # VPU workaround for the per-ray march, where it stays the engine).
    # Which field an export rode is recorded in
    # ExportReport.stats["sdf_field"], and
    # tests/test_logo.py::test_logo_export_baked_vs_exact gates the
    # baked-path mesh (opt-in use_pallas=True) against the exact brush
    # at mesh level.
    table = _bake_letter_tables(segments, bits)
    table_name = f"logo_{index}_{letter}"
    letter_fn.__kernel_prelude__ = {
        table_name: lambda arrays, _t=table: jnp.asarray(_t)
    }
    letter_fn.__kernel_twin__ = _make_letter_twin(table_name)
    # The twin is an APPROXIMATION (unlike Design1/Design2's exact twins):
    # declare its near-surface tolerance in brush units so consumers can
    # see — and report — when an evaluation rode the baked field
    # (BatchEvaluator.sdf_field / ExportReport.stats["sdf_field"]).  The
    # bound is the gate test_kernel_twin_matches_brush enforces in the
    # march-visible band (tests/test_logo.py).
    letter_fn.__twin_approx__ = 0.02
    _register_letter_interval(letter_fn, _curve_samples_np(segments))

    brush = c.define_brush(letter_fn, name=f"letter_{letter}")
    return api.Component(brush, transform=transform, compiler=c)


def build(compiler=None, font_path: Optional[str] = None, letters: str = "CSG"):
    from fontTools.ttLib import TTFont

    c = api.new_design() if compiler is None else compiler
    font = TTFont(font_path or _default_font())

    eks = np.array([1.0, 0.0, 0.0])
    why = np.array([0.0, 1.0, 0.0])
    zee = np.array([0.0, 0.0, 1.0])
    frames = [
        Transform.axes(eks, why, -zee),
        Transform.axes(zee, why, eks),
        Transform.axes(zee, -eks, why),
    ]
    components = [
        _letter_component(c, font, letter, frame, i)
        for i, (letter, frame) in enumerate(zip(letters, frames))
    ]
    api.drawUnion(*components, compiler=c)
    return c.commit()
