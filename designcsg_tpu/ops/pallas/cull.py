"""Exact per-tile object culling for the tape kernels (interval arithmetic).

The reference evaluates every object's brush at every march step for every
pixel (primary_sdf loops the whole tape, k1.cl:186-234) — so do our kernels,
and on TPU the tape is *instruction-issue bound*: the VPU sustains roughly
one native (8, 128) vector op per cycle, so the only way to go faster at
exact semantics is to issue fewer instructions.  This module prunes tape
IMPORTs whose brush evaluation provably cannot influence the CSG result for
any point in the tile:

1. at build time the tape is executed symbolically into an expression tree
   (each IMPORT is a leaf; MIN/MAX/NEGATE/IDENTITY are interior nodes — the
   compiler's register machine is single-assignment per step, so the tree is
   exact);
2. at run time, given an axis-aligned bounding box of the tile's (active)
   points, scalar interval arithmetic bounds every leaf through its brush's
   *interval twin* and propagates [lo, hi] bottom-up through the tree;
3. relevance flows top-down: at MIN(a, b), child a is irrelevant when
   ``lo_a >= hi_b`` (b wins pointwise for every point in the box); at
   MAX(a, b) when ``hi_a <= lo_b``; NEGATE swaps the interval;
4. an irrelevant leaf's IMPORT is replaced by the broadcast of its interval
   lower bound — any value inside the proven interval keeps every ancestor
   op's result bit-identical for every point (monotonicity), so the culled
   evaluation is EXACT, not approximate: the k1-parity gates still hold.

Brushes without an interval twin get (-inf, +inf) and are never culled (the
same escape hatch as the kernel-twin registry).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import brushes as _b
from ...compiler import CompiledScene
from ...constants import (
    AXES_RADIUS,
    INITIAL_SCALE,
    MAX_DISTANCE,
    OP_EXPORT,
    OP_IDENTITY,
    OP_IMPORT,
    OP_MAX,
    OP_MIN,
    OP_NEGATE,
)

_BIG = np.float32(3.0e38)

# -- scalar interval helpers -------------------------------------------------


def iv_const(c):
    c = jnp.float32(c)
    return (c, c)


def iv_add(a, b):
    return (a[0] + b[0], a[1] + b[1])


def iv_sub(a, b):
    return (a[0] - b[1], a[1] - b[0])


def iv_neg(a):
    return (-a[1], -a[0])


def iv_min(a, b):
    return (jnp.minimum(a[0], b[0]), jnp.minimum(a[1], b[1]))


def iv_max(a, b):
    return (jnp.maximum(a[0], b[0]), jnp.maximum(a[1], b[1]))


def iv_mul_scalar(a, c):
    """Interval times a (possibly negative) runtime scalar."""
    x, y = a[0] * c, a[1] * c
    return (jnp.minimum(x, y), jnp.maximum(x, y))


def iv_mul(a, b):
    """General interval product (endpoint extremes)."""
    p0, p1 = a[0] * b[0], a[0] * b[1]
    p2, p3 = a[1] * b[0], a[1] * b[1]
    lo = jnp.minimum(jnp.minimum(p0, p1), jnp.minimum(p2, p3))
    hi = jnp.maximum(jnp.maximum(p0, p1), jnp.maximum(p2, p3))
    return (lo, hi)


def ray_box(o_proj, ray_ivs, ivd):
    """Axis box of ``o + d * r`` for d in ``ivd`` and per-component ray
    intervals ``ray_ivs`` — the cheap per-step tile bound for the march
    (ray spreads are loop-invariant; only d's bounds change per step)."""
    return tuple(
        iv_add(iv_const(o), iv_mul(ivd, rc))
        for o, rc in zip(o_proj, ray_ivs)
    )


def iv_abs(a):
    lo = jnp.maximum(jnp.maximum(a[0], -a[1]), 0.0)
    hi = jnp.maximum(-a[0], a[1])
    return (lo, hi)


def iv_square(a):
    al, ah = iv_abs(a)
    return (al * al, ah * ah)


def iv_sqrt(a):
    return (jnp.sqrt(jnp.maximum(a[0], 0.0)), jnp.sqrt(jnp.maximum(a[1], 0.0)))


def iv_norm3(a, b, c):
    """Interval of sqrt(a^2 + b^2 + c^2)."""
    s = iv_add(iv_add(iv_square(a), iv_square(b)), iv_square(c))
    return iv_sqrt(s)


# -- brush interval twins ----------------------------------------------------

#: jnp brush fn -> interval twin ``f(ia, ib, ic, ctx) -> (lo, hi)`` over
#: scalar component intervals of the local point.
INTERVAL_BRUSHES: Dict[Callable, Callable] = {}


def register_interval_brush(original_fn: Callable):
    def deco(fn):
        INTERVAL_BRUSHES[original_fn] = fn
        return fn

    return deco


def verify_interval_twin(
    original_fn: Callable,
    radius: float = 4.0,
    n_boxes: int = 256,
    samples_per_box: int = 64,
    ctx=None,
    seed: int = 0,
    boxes=None,
) -> float:
    """Sampled soundness check of a brush's registered interval twin.

    Draws random boxes in local coordinates, evaluates the pointwise brush
    on samples inside each box, and measures how far any sample escapes the
    twin's (lo, hi) interval.  Returns the max violation (0.0 when every
    sampled value is enclosed) — a sampled check can only *find* unsound
    constants, not prove soundness, but it is exactly the guard ADVICE r3
    asked for: an underestimated ``lipschitz``/``enclosure_radius`` in
    :func:`register_lipschitz_interval` silently breaks the cull's
    exactness claim, and this catches it the same way the Lipschitz
    estimator catches non-distance brushes.  Run it from tests for every
    registered twin (tests/test_pallas.py)."""
    from ...brushes import EvalContext

    twin = INTERVAL_BRUSHES.get(original_fn)
    if twin is None:
        raise KeyError(f"no interval twin registered for {original_fn}")
    if ctx is None:
        ctx = EvalContext()
    rng = np.random.default_rng(seed)
    if boxes is not None:
        # Caller-targeted boxes: random fuzz rarely samples thin bands
        # (e.g. the inside-near-anchor region of the letter twins, ADVICE
        # r4) — tests can aim boxes exactly there.
        lo, hi = (np.asarray(a, np.float64) for a in boxes)
        n_boxes = lo.shape[0]
        size = hi - lo
    else:
        lo = rng.uniform(-radius, radius, size=(n_boxes, 3))
        size = rng.uniform(0.0, radius, size=(n_boxes, 3)) * rng.uniform(
            0.02, 1.0, size=(n_boxes, 1)
        )
        hi = lo + size
    # random interior samples + the 8 corners per box (extrema often live
    # on corners), evaluated in ONE batched brush call; the interval twin
    # evaluates once with ARRAY endpoints — the iv_* ops are elementwise
    # jnp, so (lo[B], hi[B]) tuples vectorize over boxes for free.
    k = samples_per_box
    u = rng.random((n_boxes, k, 3))
    pts = lo[:, None, :] + u * size[:, None, :]
    corners = np.stack(
        [
            np.stack(
                [
                    np.where(i & 1, hi[:, 0], lo[:, 0]),
                    np.where(i & 2, hi[:, 1], lo[:, 1]),
                    np.where(i & 4, hi[:, 2], lo[:, 2]),
                ],
                axis=-1,
            )
            for i in range(8)
        ],
        axis=1,
    )  # [B, 8, 3]
    pts = np.concatenate([pts, corners], axis=1).astype(np.float32)
    vals = np.asarray(
        original_fn(jnp.asarray(pts.reshape(-1, 3)), ctx)
    ).reshape(n_boxes, k + 8)
    ivx = (jnp.asarray(lo[:, 0], jnp.float32), jnp.asarray(hi[:, 0], jnp.float32))
    ivy = (jnp.asarray(lo[:, 1], jnp.float32), jnp.asarray(hi[:, 1], jnp.float32))
    ivz = (jnp.asarray(lo[:, 2], jnp.float32), jnp.asarray(hi[:, 2], jnp.float32))
    tlo, thi = twin(ivx, ivy, ivz, ctx)
    tlo = np.asarray(tlo, np.float64)
    thi = np.asarray(thi, np.float64)
    worst = np.maximum(
        tlo - vals.min(axis=1), vals.max(axis=1) - thi
    ).max()
    return float(max(worst, 0.0))


@register_interval_brush(_b.empty_brush_fn)
def _empty_iv(ia, ib, ic, ctx):
    return iv_const(MAX_DISTANCE)


@register_interval_brush(_b.space_brush_fn)
def _space_iv(ia, ib, ic, ctx):
    return iv_const(0.0)


@register_interval_brush(_b.sphere_brush_fn)
def _sphere_iv(ia, ib, ic, ctx):
    return iv_sub(iv_norm3(ia, ib, ic), iv_const(0.5))


@register_interval_brush(_b.cylinder_brush_fn)
def _cylinder_iv(ia, ib, ic, ctx):
    r = iv_sqrt(iv_add(iv_square(ia), iv_square(ic)))
    return iv_max(
        iv_sub(r, iv_const(0.5)), iv_sub(iv_abs(ib), iv_const(0.5))
    )


@register_interval_brush(_b.box_brush_fn)
def _box_iv(ia, ib, ic, ctx):
    return iv_sub(
        iv_max(iv_abs(ia), iv_max(iv_abs(ib), iv_abs(ic))), iv_const(0.5)
    )


def register_lipschitz_interval(
    original_fn: Callable,
    anchor=(0.0, 0.0, 0.0),
    lipschitz: float = 1.0,
    enclosure_radius: Optional[float] = None,
):
    """Register a sound interval twin for a Lipschitz brush without writing
    interval arithmetic by hand.  Two complementary bounds:

    * Lipschitz band: ``|sdf(p) - sdf(p0)| <= L * |p - p0|`` (anchor ``p0``
      evaluated once at registration) — tight near the anchor, and the only
      upper bound;
    * far field (needs ``enclosure_radius``): when the brush dominates the
      L∞ distance to an enclosing region, ``sdf(p) >= ||p - p0||∞ - R`` —
      this is what lets a far tile *cull* the brush (the Lipschitz lower
      bound goes to −∞ with distance, the far-field one grows).

    Requirements, both in *local* coordinates (internal coordinate scalings
    count: a brush evaluating a unit box at ``3*(v-c)`` has L=3):
    ``lipschitz`` ≥ sup|∇sdf|; ``enclosure_radius`` R such that
    ``sdf(p) >= ||p - p0||∞ - R`` everywhere (true for min/max folds of
    Chebyshev boxes and of Euclidean primitives with R covering the solid's
    L∞ extent about the anchor).  Underestimates silently break the cull's
    exactness — fuzz every registration with :func:`verify_interval_twin`
    (random boxes vs the pointwise brush) from a test, as
    tests/test_pallas.py does for the shipped designs."""
    from ...brushes import EvalContext

    p0 = np.asarray(anchor, np.float32)
    L = float(lipschitz)
    c0 = float(
        np.asarray(
            original_fn(jnp.asarray(p0.reshape(1, 3)), EvalContext())
        ).reshape(())
    )

    def twin(ia, ib, ic, ctx):
        da = iv_sub(ia, iv_const(p0[0]))
        db = iv_sub(ib, iv_const(p0[1]))
        dc = iv_sub(ic, iv_const(p0[2]))
        dist = iv_norm3(da, db, dc)
        lo = c0 - L * dist[1]
        hi = c0 + L * dist[1]
        if enclosure_radius is not None:
            inf_lo = jnp.maximum(
                jnp.maximum(iv_abs(da)[0], iv_abs(db)[0]), iv_abs(dc)[0]
            )
            lo = jnp.maximum(lo, inf_lo - enclosure_radius)
        return (lo, hi)

    INTERVAL_BRUSHES[original_fn] = twin
    return twin


# -- tape expression tree ----------------------------------------------------


@dataclasses.dataclass
class _Node:
    op: str  # "leaf" | "min" | "max" | "neg" | "gizmo" | "const"
    children: tuple = ()
    import_index: int = -1  # position in the tape's IMPORT sequence
    brush: int = -1  # brush bank index
    obj: int = -1  # object row
    const: float = 0.0
    negated: bool = False  # leaf parity after De Morgan pushdown


def build_tape_tree(tape) -> Tuple[Optional[_Node], int]:
    """Execute the command tape symbolically; returns (root node, number of
    IMPORTs).  The compiler's register machine assigns each register before
    use, so symbolic execution reproduces the exact CSG expression."""
    regs: Dict[int, _Node] = {}
    root: Optional[_Node] = None
    n_imports = 0
    for opcode, left, right, dest in tape:
        if opcode == OP_IMPORT:
            regs[dest] = _Node(
                "leaf", import_index=n_imports, brush=left, obj=right
            )
            n_imports += 1
        elif opcode == OP_MIN:
            regs[dest] = _Node("min", (regs[left], regs[right]))
        elif opcode == OP_MAX:
            regs[dest] = _Node("max", (regs[left], regs[right]))
        elif opcode == OP_NEGATE:
            regs[dest] = _Node("neg", (regs[left],))
        elif opcode == OP_IDENTITY:
            regs[dest] = regs[left]
        elif opcode == OP_EXPORT:
            root = regs[left]
    return root, n_imports


def _gizmo_interval(ivx, ivy, ivz):
    """Interval twin of tape.gizmo_component_sdf (k1.cl:237-270)."""
    inv = 1.0 / INITIAL_SCALE
    xs = iv_mul_scalar(ivx, jnp.float32(inv))
    ys = iv_mul_scalar(ivy, jnp.float32(inv))
    zs = iv_mul_scalar(ivz, jnp.float32(inv))

    def cyl(r2, h):
        return iv_max(
            iv_sub(iv_abs(h), iv_const(0.5)),
            iv_sub(iv_sqrt(r2), iv_const(AXES_RADIUS)),
        )

    half = iv_const(0.5)
    dx = cyl(iv_add(iv_square(ys), iv_square(zs)), iv_sub(xs, half))
    dy = cyl(iv_add(iv_square(xs), iv_square(zs)), iv_sub(ys, half))
    dz = cyl(iv_add(iv_square(xs), iv_square(ys)), iv_sub(zs, half))
    return iv_min(dx, iv_min(dy, dz))


def _push_neg(node: _Node, neg: bool = False) -> _Node:
    """De Morgan pushdown + flatten: an equivalent tree of *n-ary* min/max
    nodes with all NEGATEs absorbed into leaf parity (min/max fold chains in
    the tape become one wide node whose children can be cull-grouped)."""
    if node.op in ("leaf", "gizmo"):
        return dataclasses.replace(node, negated=neg != node.negated)
    if node.op == "neg":
        return _push_neg(node.children[0], not neg)
    if node.op in ("min", "max"):
        op = node.op if not neg else ("max" if node.op == "min" else "min")
        flat = []
        for c in node.children:
            k = _push_neg(c, neg)
            if k.op == op:
                flat.extend(k.children)
            else:
                flat.append(k)
        return _Node(op, tuple(flat))
    return node


def _twin_cost(fn) -> int:
    """Rough per-eval instruction count of a kernel brush twin (jaxpr eqn
    count, nested jaxprs included) — drives cull branch grouping: a live
    Mosaic branch costs on the order of one cheap brush eval, so only
    subtrees meaningfully more expensive than a branch earn their own."""
    from ...brushes import EvalContext

    try:
        def wrapped(x, y, z, ad):
            return fn(x, y, z, EvalContext(ad=ad))

        jaxpr = jax.make_jaxpr(wrapped)(
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((1024, 128), jnp.float32),
        ).jaxpr

        def count(jx):
            n = 0
            for eq in jx.eqns:
                n += 1
                for v in eq.params.values():
                    core = getattr(v, "jaxpr", None)
                    if core is not None:
                        n += count(core)
            return n

        return count(jaxpr)
    except Exception:
        return 10_000


#: A live scf.if in Mosaic costs roughly this many vector-op slots; leaves
#: cheaper than a couple of branches are bucketed into one shared branch.
_SOLO_COST = 120


def worth_culling(scene: CompiledScene, gizmo: bool = False) -> bool:
    """Cost heuristic: does the scene have a prunable brush expensive enough
    that skipping it could recoup the branch + scalar interval-chain
    overhead (measured on v5e: a live branch ~ one cheap brush eval; the
    per-tile scalar chain ~ one full cheap tape)?

    NOTE this is a *necessary*, not sufficient, condition — measured on the
    shipped designs even the ~300-op Hilbert brush nets out neutral, because
    in open space the SDF *equals* the distance to the nearest object, and
    the nearest (hence unprunable) object is often the expensive one.  The
    cull therefore stays opt-in (``cull=True`` / ``march_cull=True``); this
    predicate is exposed for diagnostics and for scenes with many expensive
    brushes spread apart, where per-tile pruning genuinely pays."""
    from .brushes_kernel import _twin_of

    culler = make_tape_culler(scene, gizmo=gizmo)
    if culler is None:
        return False
    for fn in scene.brush_fns:
        if INTERVAL_BRUSHES.get(fn) is None:
            continue
        twin = _twin_of(fn)
        if twin is not None and _twin_cost(twin) >= 2 * _SOLO_COST:
            return True
    return False


def make_tape_culler(scene: CompiledScene, gizmo: bool = False):
    """Build a culler for the scene's tape, or None when the tape has no
    prunable structure.

    The culler is a callable ``cull(box, bank, ctx) -> (preds, substs)``
    with a static attribute ``groups`` (tuple of tuples of import slots —
    slot ``n_imports`` is the gizmo).  ``box`` is ((x0,x1),(y0,y1),(z0,z1))
    scalar bounds of the tile's points; ``preds[g]`` says group g must be
    evaluated, ``substs[k]`` is the exact substitute for slot k when its
    group is skipped.  Grouping is cost-aware: cheap sibling leaves share
    one branch (a Mosaic branch costs about one cheap brush eval), while
    expensive brushes and nested subtrees get their own."""
    tape = [tuple(int(v) for v in row) for row in np.asarray(scene.arrays.tape)]
    root, n_imports = build_tape_tree(tape)
    if root is None or n_imports + int(gizmo) < 3:
        return None
    if gizmo:
        root = _Node("min", (root, _Node("gizmo", import_index=n_imports)))
    root = _push_neg(root)
    if root.op not in ("min", "max"):
        return None
    iv_twins = [INTERVAL_BRUSHES.get(fn) for fn in scene.brush_fns]

    from .brushes_kernel import _twin_of

    cost_cache: Dict[int, int] = {}

    def leaf_cost(node):
        if node.op == "gizmo":
            return 30
        if node.brush not in cost_cache:
            twin = _twin_of(scene.brush_fns[node.brush])
            cost_cache[node.brush] = _twin_cost(twin) if twin else 10_000
        return cost_cache[node.brush]

    def leaf_twinned(node):
        return node.op == "gizmo" or iv_twins[node.brush] is not None

    # -- static unit partition per n-ary node --
    groups: List[tuple] = []  # groups[g] = tuple of slots sharing one branch
    node_units: Dict[int, list] = {}  # id(node) -> units

    def partition(node):
        units = []
        bucket: list = []
        for c in node.children:
            if c.op in ("leaf", "gizmo"):
                if not leaf_twinned(c):
                    units.append(("always", c))
                elif leaf_cost(c) >= _SOLO_COST:
                    gid = len(groups)
                    groups.append((c.import_index,))
                    units.append(("bucket", gid, [c]))
                else:
                    bucket.append(c)
            else:
                units.append(("sub", c))
                partition(c)
        if bucket:
            gid = len(groups)
            groups.append(tuple(b.import_index for b in bucket))
            units.append(("bucket", gid, bucket))
        node_units[id(node)] = units

    partition(root)
    if not groups:
        return None

    def cull(box, bank, ctx):
        (x0, x1), (y0, y1), (z0, z1) = box
        ivx, ivy, ivz = (x0, x1), (y0, y1), (z0, z1)

        def local_interval(obj):
            (ox, oy, oz), r3, u3, f3 = bank(obj)
            dx = iv_sub(ivx, iv_const(ox))
            dy = iv_sub(ivy, iv_const(oy))
            dz = iv_sub(ivz, iv_const(oz))

            def dot(v3):
                return iv_add(
                    iv_add(iv_mul_scalar(dx, v3[0]), iv_mul_scalar(dy, v3[1])),
                    iv_mul_scalar(dz, v3[2]),
                )

            return dot(r3), dot(u3), dot(f3)

        def pad(iv):
            # Interval endpoints and the pointwise tape round differently
            # (FMA contraction, op order), so a mathematically-true bound can
            # be a few ulps off the float evaluation; widen so the cull only
            # engages with rounding margin — substitution stays bit-exact.
            slack = 1e-6 * (jnp.abs(iv[0]) + jnp.abs(iv[1])) + 1e-6
            return (iv[0] - slack, iv[1] + slack)

        substs: List = [None] * (n_imports + int(gizmo))
        intervals: Dict[int, tuple] = {}

        def node_iv(node):
            """Analysis interval (leaf parity applied), memoized by id."""
            if id(node) in intervals:
                return intervals[id(node)]
            if node.op == "gizmo":
                brush_iv = pad(_gizmo_interval(ivx, ivy, ivz))
                substs[node.import_index] = brush_iv[0]
                iv = iv_neg(brush_iv) if node.negated else brush_iv
            elif node.op == "leaf":
                twin = iv_twins[node.brush]
                if twin is None:
                    brush_iv = (jnp.float32(-_BIG), jnp.float32(_BIG))
                else:
                    ia, ib, ic = local_interval(node.obj)
                    brush_iv = pad(twin(ia, ib, ic, ctx))
                substs[node.import_index] = brush_iv[0]
                iv = iv_neg(brush_iv) if node.negated else brush_iv
            elif node.op == "min":
                iv = node_iv(node.children[0])
                for c in node.children[1:]:
                    iv = iv_min(iv, node_iv(c))
            else:  # "max"
                iv = node_iv(node.children[0])
                for c in node.children[1:]:
                    iv = iv_max(iv, node_iv(c))
            intervals[id(node)] = iv
            return iv

        node_iv(root)

        preds: List = [None] * len(groups)

        def unit_iv(node, u):
            if u[0] == "sub":
                return node_iv(u[1])
            if u[0] == "always":
                return node_iv(u[1])
            ivs = [node_iv(m) for m in u[2]]
            iv = ivs[0]
            for other in ivs[1:]:
                iv = iv_min(iv, other) if node.op == "min" else iv_max(iv, other)
            return iv

        def down(node, rel):
            units = node_units[id(node)]
            uivs = [unit_iv(node, u) for u in units]
            for i, u in enumerate(units):
                if len(units) == 1:
                    rel_u = rel
                elif node.op == "min":
                    # unit i can win the min somewhere only if its lo is
                    # below the smallest hi among the other units
                    other_hi = None
                    for j, iv in enumerate(uivs):
                        if j == i:
                            continue
                        other_hi = (
                            iv[1]
                            if other_hi is None
                            else jnp.minimum(other_hi, iv[1])
                        )
                    rel_u = jnp.logical_and(rel, uivs[i][0] < other_hi)
                else:
                    other_lo = None
                    for j, iv in enumerate(uivs):
                        if j == i:
                            continue
                        other_lo = (
                            iv[0]
                            if other_lo is None
                            else jnp.maximum(other_lo, iv[0])
                        )
                    rel_u = jnp.logical_and(rel, uivs[i][1] > other_lo)
                if u[0] == "bucket":
                    preds[u[1]] = rel_u
                elif u[0] == "sub":
                    down(u[1], rel_u)

        down(root, jnp.bool_(True))
        return preds, substs

    cull.groups = tuple(groups)
    cull.n_slots = n_imports + int(gizmo)
    return cull
