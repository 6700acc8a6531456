"""Scene compiler: CSG tree -> flat tape + object banks (the IR).

The reference hands its IR between processes as four files — scene.cl,
scene.txt, buildprocedure.txt, arbitrary_data.hex
(reference: /root/reference/master/scenecompiler.py:466-582).  Here the IR is an
in-memory :class:`CompiledScene`: device arrays (object banks / tape /
arbitrary data) plus static Python banks of brush & material functions.  The
reference text formats are still supported (``write_artifacts`` /
``load_reference_scene``) for differential testing against the OpenCL
pipeline's committed goldens.

TPU-first design note: the tape and banks are *data*, but the brush bank is
*code*.  The renderer/evaluator partially evaluates the tape at JAX trace time
(see ops/interpreter.py), which is the TPU-native analog of the reference's
runtime OpenCL source concatenation (``copy /b k1.cl + scene.cl``,
DesignCSG.cpp:545-546).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

from . import brushes as _brushes
from . import scene as _scene
from . import transforms as tf
from .constants import (
    ARBITRARY_DATA_POINTS,
    INITIAL_SCALE,
    MAX_BUILD_STEPS,
    MAX_OBJECTS,
    STACK_MEMORY_PER_PIXEL,
    OPCODE_NAMES,
)


@dataclasses.dataclass
class ExportConfig:
    """Per-design export quality knobs (reference exportConfig.txt, 9 lines:
    DesignCSG.py:205-237 / DesignCSG.cpp:815-835).

    ``bounding_box_half_diameter`` is stored in *world* units (the reference
    writes ``5.0*boundingBoxHalfDiameter``, DesignCSG.py:225).

    ``minimum_octree_level`` / ``maximum_octree_level`` /
    ``complex_surface_threshold`` drive the adaptive multi-resolution
    extraction (``export_mesh(..., strategy="adaptive")``; export/adaptive.py)
    — the counterpart of the reference octree's refine-on-complex-surface
    descent (mesh.hpp:214-267).  The uniform strategies use ``grid_level``
    only, as the reference's octree bottoms out there.

    ``cache_subdivision`` / ``queries_before_gc`` / ``queries_before_free``
    are accepted and serialized for exportConfig.txt format parity but have
    no effect: they tune the reference's ISV point-query cache (ISV.hpp),
    which dense tiled/active-block evaluation replaces outright (SURVEY.md
    §7.1 — there is no point-at-a-time query path to cache).
    """

    #: knobs kept only so exportConfig.txt round-trips; see class docstring.
    FORMAT_PARITY_ONLY = (
        "cache_subdivision",
        "queries_before_gc",
        "queries_before_free",
    )

    bounding_box_half_diameter: float = 10.0  # world units (already x5)
    minimum_octree_level: int = 5
    maximum_octree_level: int = 7
    grid_level: int = 8
    complex_surface_threshold: float = np.pi / 4.0
    gradient_descent_steps: int = 50  # the reference designs' typical value
    cache_subdivision: int = 16
    queries_before_gc: int = 64
    queries_before_free: int = 1024

    def to_lines(self) -> str:
        vals = [
            self.bounding_box_half_diameter,
            self.minimum_octree_level,
            self.maximum_octree_level,
            self.grid_level,
            self.complex_surface_threshold,
            self.gradient_descent_steps,
            self.cache_subdivision,
            self.queries_before_gc,
            self.queries_before_free,
        ]
        return "".join(str(v) + "\n" for v in vals)

    @staticmethod
    def from_lines(text: str) -> "ExportConfig":
        vals = [ln.strip() for ln in text.strip().splitlines() if ln.strip()]
        return ExportConfig(
            bounding_box_half_diameter=float(vals[0]),
            minimum_octree_level=int(vals[1]),
            maximum_octree_level=int(vals[2]),
            grid_level=int(vals[3]),
            complex_surface_threshold=float(vals[4]),
            gradient_descent_steps=int(vals[5]),
            cache_subdivision=int(vals[6]),
            queries_before_gc=int(vals[7]),
            queries_before_free=int(vals[8]),
        )


@dataclasses.dataclass
class SceneArrays:
    """The traced (differentiable) part of a compiled scene.

    Row layout matches scene.txt (Appendix A of SURVEY.md): per object,
    position plus *reciprocal* propagated frame axes; SDF local coords are
    ``((v-p)@r, (v-p)@u, (v-p)@f)``.
    """

    shape_id: np.ndarray  # i32[N]
    material_id: np.ndarray  # i32[N]
    position: np.ndarray  # f32[N, 3]
    right: np.ndarray  # f32[N, 3] (reciprocal axes)
    up: np.ndarray  # f32[N, 3]
    forward: np.ndarray  # f32[N, 3]
    tape: np.ndarray  # i32[T, 4] (opcode, left, right, dest)
    ad: np.ndarray  # f32[ARBITRARY_DATA_POINTS]

    def replace(self, **kwargs) -> "SceneArrays":
        """Functional update — the fit harness swaps differentiable banks in
        (positions/frames/ad) while keeping the integer structure."""
        return dataclasses.replace(self, **kwargs)

    def content_digest(self) -> bytes:
        """Digest of EVERY bank (any geometry-affecting change must change
        it) — the shared key for resume shards and per-scene caches.  Do
        not hand-pick fields at call sites: omitting a bank silently aliases
        differently-shaped scenes (e.g. an orientation-only edit changes
        only up/forward)."""
        import hashlib

        h = hashlib.sha256()
        for leaf in self.tree_flatten()[0]:
            arr = np.ascontiguousarray(np.asarray(leaf))
            # Frame each leaf with dtype + shape so concatenated bank bytes
            # cannot alias across different leaf boundaries (ADVICE r3 —
            # e.g. a different object count vs ad length with identical
            # raw bytes must produce a different key).
            h.update(arr.dtype.str.encode())
            h.update(np.asarray(arr.shape, np.int64).tobytes())
            h.update(arr.tobytes())
        return h.digest()

    def tree_flatten(self):
        children = (
            self.shape_id,
            self.material_id,
            self.position,
            self.right,
            self.up,
            self.forward,
            self.tape,
            self.ad,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _register_pytree():
    import jax.tree_util as jtu

    jtu.register_pytree_node(
        SceneArrays,
        lambda s: s.tree_flatten(),
        lambda aux, ch: SceneArrays.tree_unflatten(aux, ch),
    )


_register_pytree()


@dataclasses.dataclass
class CompiledScene:
    """Arrays + static function banks; the unit every evaluator consumes."""

    arrays: SceneArrays
    brush_fns: Tuple[Callable, ...]
    material_fns: Tuple[Callable, ...]
    num_registers: int
    export_config: Optional[ExportConfig] = None
    ad_chunks: Tuple[Tuple[str, int, int], ...] = ()  # (name, start, length)

    @property
    def num_objects(self) -> int:
        return int(self.arrays.shape_id.shape[0])

    @property
    def num_build_steps(self) -> int:
        return int(self.arrays.tape.shape[0])

    def ad_offset(self, name: str) -> int:
        """Start offset of a named arbitrary-data chunk (the reference's
        ``#define AD_<name> <start>``, scenecompiler.py:469-473)."""
        for cname, start, _ in self.ad_chunks:
            if cname == name:
                return start
        raise KeyError(f"no arbitrary-data chunk named {name!r}")


@dataclasses.dataclass
class ArbitraryDataChunk:
    name: str
    start: int
    data: Sequence[float]


class SceneCompiler:
    """Builds the CSG tree and compiles it (scenecompiler.py:408-594).

    Not a singleton: make as many as you like (tests do).  The module-level
    facade in :mod:`designcsg_tpu.api` holds a "current" compiler to mirror the
    reference's script-style API.
    """

    def __init__(self):
        self.ad_counter = 0
        self.ad: List[ArbitraryDataChunk] = []
        self.brushes: List[_brushes.Brush] = []
        self.materials: List[_brushes.Material] = []
        self.empty_brush = self.define_brush(_brushes.empty_brush_fn, name="empty")
        self.space_brush = self.define_brush(_brushes.space_brush_fn, name="space")
        self.abs_normals = self.define_material(_brushes.abs_normals_fn, name="abs_normals")
        self.basic_lighting = self.define_material(
            _brushes.basic_lighting_fn, name="basic_lighting"
        )
        self.root = _scene.Component(
            brush=self.null_brush(),
            material=self.default_material(),
            transform=tf.scaling(np.array([INITIAL_SCALE] * 3)),
        )
        self.export_config: Optional[ExportConfig] = None

    # -- registries --------------------------------------------------------

    def define_brush(self, fn: Callable, name: str = "") -> _brushes.Brush:
        brush = _brushes.Brush(fn=fn, bank_index=len(self.brushes), name=name)
        self.brushes.append(brush)
        return brush

    def define_material(self, fn: Callable, name: str = "") -> _brushes.Material:
        material = _brushes.Material(fn=fn, bank_index=len(self.materials), name=name)
        self.materials.append(material)
        return material

    def null_brush(self) -> _brushes.Brush:
        return self.empty_brush

    def void_brush(self) -> _brushes.Brush:
        return self.space_brush

    def default_material(self) -> _brushes.Material:
        return self.basic_lighting

    def add_arbitrary_data(self, name: str, data: Sequence[float]) -> int:
        """Register a float chunk addressable from brushes via
        ``ctx.ad[start + offset]``; returns the start offset."""
        start = self.ad_counter
        self.ad_counter += len(data)
        if self.ad_counter > ARBITRARY_DATA_POINTS:
            raise ValueError(
                f"arbitrary data overflow: {self.ad_counter} > {ARBITRARY_DATA_POINTS}"
            )
        self.ad.append(ArbitraryDataChunk(name, start, data))
        return start

    # Reference spelling:
    addArbitraryData = add_arbitrary_data

    def set_export_config(self, **kwargs) -> ExportConfig:
        """Reference ``setExportConfig`` semantics (DesignCSG.py:205-237): the
        half-diameter argument is in design units and is scaled by
        INITIAL_SCALE into world units."""
        if "boundingBoxHalfDiameter" in kwargs:
            kwargs["bounding_box_half_diameter"] = INITIAL_SCALE * kwargs.pop(
                "boundingBoxHalfDiameter"
            )
        alias = {
            "minimumOctreeLevel": "minimum_octree_level",
            "maximumOctreeLevel": "maximum_octree_level",
            "gridLevel": "grid_level",
            "complexSurfaceThreshold": "complex_surface_threshold",
            "gradientDescentSteps": "gradient_descent_steps",
            "cacheSubdivision": "cache_subdivision",
            "queriesBeforeGC": "queries_before_gc",
            "queriesBeforeFree": "queries_before_free",
        }
        for old, new in alias.items():
            if old in kwargs:
                kwargs[new] = kwargs.pop(old)
        kwargs.pop("meshSubdivisionLevel", None)
        kwargs.pop("maxPoolSize", None)
        self.export_config = ExportConfig(**kwargs)
        return self.export_config

    # -- compilation -------------------------------------------------------

    def commit(self, strict_capacity: bool = False) -> CompiledScene:
        """Flatten the tree, allocate registers, emit the tape, and bundle the
        device arrays (scenecompiler.py:466-582, minus file IO).

        ``strict_capacity`` enforces the reference's hard limits
        (MAX_OBJECTS/MAX_BUILD_STEPS/STACK_MEMORY_PER_PIXEL) for parity runs.
        """
        unrolled = self.root.get_unrolled_components()
        for index, component in enumerate(unrolled):
            component.unrolled_index = index
            component.propogate_transforms()

        n = len(unrolled)
        shape_id = np.zeros((n,), dtype=np.int32)
        material_id = np.zeros((n,), dtype=np.int32)
        position = np.zeros((n, 3), dtype=np.float64)
        right = np.zeros((n, 3), dtype=np.float64)
        up = np.zeros((n, 3), dtype=np.float64)
        forward = np.zeros((n, 3), dtype=np.float64)
        for i, component in enumerate(unrolled):
            shape_id[i] = component.brush.bank_index
            material_id[i] = component.material.bank_index
            position[i] = component.position()
            right[i] = tf.reciprocal_vector(component.right())
            up[i] = tf.reciprocal_vector(component.up())
            forward[i] = tf.reciprocal_vector(component.forward())

        allocator = _scene.Allocator()
        for component in unrolled:
            if component.children:
                component.variable = allocator.allocate()
        if self.root.variable is None:
            raise ValueError("empty scene: the root has no children")
        export_variable = self.root.variable
        allocator.allocate_scratch()

        commands = self.root.get_commands(allocator)
        commands.append(
            _scene.Command("EXPORT", export_variable, _scene.NULL_ARG, _scene.NULL_ARG)
        )
        tape = np.asarray([c.as_tuple() for c in commands], dtype=np.int32)

        ad = np.zeros((ARBITRARY_DATA_POINTS,), dtype=np.float32)
        for chunk in self.ad:
            data = np.asarray(chunk.data, dtype=np.float32)
            ad[chunk.start : chunk.start + len(data)] = data

        if strict_capacity:
            if n > MAX_OBJECTS:
                raise ValueError(f"{n} objects > MAX_OBJECTS={MAX_OBJECTS}")
            if len(commands) > MAX_BUILD_STEPS:
                raise ValueError(
                    f"{len(commands)} commands > MAX_BUILD_STEPS={MAX_BUILD_STEPS}"
                )
            if allocator.num_registers > STACK_MEMORY_PER_PIXEL:
                raise ValueError(
                    f"{allocator.num_registers} registers > "
                    f"STACK_MEMORY_PER_PIXEL={STACK_MEMORY_PER_PIXEL}"
                )

        arrays = SceneArrays(
            shape_id=shape_id,
            material_id=material_id,
            position=position.astype(np.float32),
            right=right.astype(np.float32),
            up=up.astype(np.float32),
            forward=forward.astype(np.float32),
            tape=tape,
            ad=ad,
        )
        return CompiledScene(
            arrays=arrays,
            brush_fns=tuple(b.fn for b in self.brushes),
            material_fns=tuple(m.fn for m in self.materials),
            num_registers=allocator.num_registers,
            export_config=self.export_config,
            ad_chunks=tuple((c.name, c.start, len(c.data)) for c in self.ad),
        )

    # -- reference-format artifact emission (for differential testing) -----

    def write_artifacts(self, directory: str = ".") -> CompiledScene:
        """Emit scene.txt / buildprocedure.txt / arbitrary_data.hex /
        exportConfig.txt in the reference's exact formats
        (scenecompiler.py:533-580, DesignCSG.py:221-237)."""
        import os

        compiled = self.commit()
        unrolled = self.root.get_unrolled_components()

        scene_txt = ""
        for component in unrolled:
            pos = component.position()
            _right = tf.reciprocal_vector(component.right())
            _up = tf.reciprocal_vector(component.up())
            _forward = tf.reciprocal_vector(component.forward())
            scene_txt += (
                "{:d} {:d} " + "{:.6f} " * 3 + "{:.6f} " * 8 + "{:.6f}\n"
            ).format(
                component.brush.bank_index,
                component.material.bank_index,
                *list(pos),
                *list(_right),
                *list(_up),
                *list(_forward),
            )
        with open(os.path.join(directory, "scene.txt"), "w") as fl:
            fl.write(scene_txt)

        lines = []
        for row in compiled.arrays.tape:
            lines.append("{} {} {} {}".format(*[int(x) for x in row]))
        with open(os.path.join(directory, "buildprocedure.txt"), "w") as fl:
            fl.write("\n".join(lines))

        with open(os.path.join(directory, "arbitrary_data.hex"), "wb") as fl:
            fl.write(np.asarray(compiled.arrays.ad, dtype="<f4").tobytes())

        if self.export_config is not None:
            with open(os.path.join(directory, "exportConfig.txt"), "w") as fl:
                fl.write(self.export_config.to_lines())
        return compiled


def load_reference_scene(
    scene_txt_path: str,
    buildprocedure_path: str,
    brush_fns: Sequence[Callable],
    material_fns: Sequence[Callable] = (),
    arbitrary_data_path: Optional[str] = None,
    export_config_path: Optional[str] = None,
) -> CompiledScene:
    """Load a scene from the reference's on-disk IR (the formats parsed by
    DrawPane.cpp:267-371) for differential testing.

    ``brush_fns`` must supply a JAX function per brush bank index used by the
    tape (the reference's generated scene.cl is OpenCL source we do not
    execute; equivalent JAX brushes must be provided by the caller).
    """
    rows = []
    with open(scene_txt_path) as fl:
        for line in fl:
            parts = line.split()
            if not parts:
                continue
            rows.append([float(x) for x in parts])
    rows_np = np.asarray(rows, dtype=np.float64)
    shape_id = rows_np[:, 0].astype(np.int32)
    material_id = rows_np[:, 1].astype(np.int32)
    position = rows_np[:, 2:5].astype(np.float32)
    right = rows_np[:, 5:8].astype(np.float32)
    up = rows_np[:, 8:11].astype(np.float32)
    forward = rows_np[:, 11:14].astype(np.float32)

    tape_rows = []
    with open(buildprocedure_path) as fl:
        for line in fl:
            parts = line.split()
            if len(parts) == 4:
                tape_rows.append([int(x) for x in parts])
    tape = np.asarray(tape_rows, dtype=np.int32)

    if arbitrary_data_path is not None:
        ad = np.fromfile(arbitrary_data_path, dtype="<f4").astype(np.float32)
        if ad.shape[0] < ARBITRARY_DATA_POINTS:
            ad = np.pad(ad, (0, ARBITRARY_DATA_POINTS - ad.shape[0]))
    else:
        ad = np.zeros((ARBITRARY_DATA_POINTS,), dtype=np.float32)

    export_config = None
    if export_config_path is not None:
        with open(export_config_path) as fl:
            export_config = ExportConfig.from_lines(fl.read())

    num_registers = int(tape[:, 3].max()) + 1 if len(tape) else 1
    # Registers indexed by MIN/MAX/NEGATE left/right args may exceed dests:
    for opcode, left, right_arg, dest in tape:
        if OPCODE_NAMES[int(opcode)] in ("MIN", "MAX", "NEGATE", "IDENTITY", "EXPORT"):
            num_registers = max(num_registers, int(left) + 1)
        if OPCODE_NAMES[int(opcode)] in ("MIN", "MAX"):
            num_registers = max(num_registers, int(right_arg) + 1)

    arrays = SceneArrays(
        shape_id=shape_id,
        material_id=material_id,
        position=position,
        right=right,
        up=up,
        forward=forward,
        tape=tape,
        ad=ad,
    )
    if not material_fns:
        material_fns = (_brushes.abs_normals_fn, _brushes.basic_lighting_fn)
    return CompiledScene(
        arrays=arrays,
        brush_fns=tuple(brush_fns),
        material_fns=tuple(material_fns),
        num_registers=num_registers,
        export_config=export_config,
    )
