"""Command-line interface.

The reference is a desktop app whose menu drives everything
(File->Run/Export, reference DesignCSG.cpp:113-124); the framework exposes
those capabilities as subcommands::

    python -m designcsg_tpu.cli render design1 -o out.png
    python -m designcsg_tpu.cli render path/to/mydesign.py --orbit -0.785 0.785
    python -m designcsg_tpu.cli export design2 --stl out.stl --ply out.ply
    python -m designcsg_tpu.cli artifacts design1 -d build/   # reference IR
    python -m designcsg_tpu.cli fit design1 -o fitdir/        # demo fit
    python -m designcsg_tpu.cli bench

A design is either a builtin name (design1 | design2 | logo) or a path to a
Python design script: the script either defines ``build() -> CompiledScene``
or calls the module-level API (``new_design() ... commit()``) at import time.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time


def load_design(spec: str):
    """Resolve a design spec (builtin name or script path) to a CompiledScene."""
    import designs as _designs

    if spec.lower() in ("design1", "design2", "logo"):
        return _designs.get_design(spec)
    if not os.path.exists(spec):
        raise FileNotFoundError(f"design {spec!r}: not a builtin name or a file")
    module_name = os.path.splitext(os.path.basename(spec))[0]
    sys.path.insert(0, os.path.dirname(os.path.abspath(spec)) or ".")
    spec_obj = importlib.util.spec_from_file_location(module_name, spec)
    module = importlib.util.module_from_spec(spec_obj)
    from designcsg_tpu import api

    api.new_design()
    spec_obj.loader.exec_module(module)
    if hasattr(module, "build"):
        return module.build()
    # Script-style design: it drew into the current compiler.  If it already
    # called commit() we recommit (idempotent — the tree is intact).
    return api.commit()


def _camera(args):
    from designcsg_tpu.camera import Camera

    cam = Camera.initial(apply_default_orbit=not getattr(args, "no_default_orbit", False))
    if getattr(args, "orbit", None):
        cam.orbit(args.orbit[0], args.orbit[1])
    if getattr(args, "zoom", 0.0):
        cam.zoom(args.zoom)
    return cam


def cmd_render(args):
    import numpy as np

    from designcsg_tpu.config import RenderConfig
    from designcsg_tpu.ops.raymarch import render_scene, to_u8

    import dataclasses

    scene = load_design(args.design)
    fast = getattr(args, "fast", False)
    config = RenderConfig(
        width=args.width,
        height=args.height,
        gizmo=not args.no_gizmo,
        # --fast: over-relaxed stepping + the hierarchical cone prepass —
        # both hit-preserving (tests/test_raymarch.py, tests/test_pallas.py).
        march_overrelax=1.6 if fast else 1.0,
    )
    if (
        fast
        and args.width % config.hierarchical_factor == 0
        and args.height % config.hierarchical_factor == 0
    ):
        config = dataclasses.replace(config, march_hierarchical=True)
    cam = _camera(args)
    t0 = time.time()
    use_pallas = args.backend == "pallas"
    if use_pallas:
        import jax.numpy as jnp

        from designcsg_tpu.ops.interpreter import as_device_arrays
        from designcsg_tpu.ops.pallas import (
            make_hierarchical_renderer,
            make_pallas_renderer,
            supports_scene,
        )

        if not supports_scene(scene):
            print("scene has unregistered kernel brushes; falling back to jnp")
            use_pallas = False
        else:
            factory = (
                make_hierarchical_renderer
                if config.march_hierarchical
                else make_pallas_renderer
            )
            render = factory(scene, config)
            campos, rgt, upp, fwd = (jnp.asarray(a) for a in cam.as_arrays())
            img = render(as_device_arrays(scene.arrays), campos, rgt, upp, fwd)
    if not use_pallas:
        img = render_scene(scene, camera=cam, config=config)
    u8 = np.asarray(to_u8(img))
    print(f"rendered {config.width}x{config.height} in {time.time()-t0:.2f}s")
    from PIL import Image

    Image.fromarray(u8).save(args.output)
    print(f"wrote {args.output}")


def cmd_watch(args):
    """Edit-run loop: re-render the design script whenever it changes.

    The reference's whole GUI workflow is edit -> File->Run -> look at the
    viewport, with script errors shown in the console (DesignCSG.cpp:531-568
    + log.txt).  Here: poll the script's mtime, re-exec + re-render on
    change, print render time or the script's exception — the same loop for
    a terminal + any image viewer that auto-reloads."""
    if not os.path.exists(args.design):
        raise FileNotFoundError(f"watch needs a design script path: {args.design!r}")
    last_mtime = None
    renders = 0
    while True:
        try:
            mtime = os.path.getmtime(args.design)
        except OSError:
            time.sleep(args.poll)
            continue
        if mtime != last_mtime:
            last_mtime = mtime
            try:
                cmd_render(args)
            except KeyboardInterrupt:
                raise
            except Exception as exc:  # script errors land in the console,
                # like the reference's log.txt channel — the loop survives.
                print(f"design error: {type(exc).__name__}: {exc}")
            renders += 1
            if args.max_renders and renders >= args.max_renders:
                return
            print(f"watching {args.design} (ctrl-c to stop)")
        time.sleep(args.poll)


def cmd_export(args):
    from designcsg_tpu.export.pipeline import export_mesh
    from designcsg_tpu.observability import ExportMonitor

    scene = load_design(args.design)
    config = scene.export_config
    if args.grid_level is not None:
        import dataclasses

        from designcsg_tpu.compiler import ExportConfig

        config = dataclasses.replace(
            config or ExportConfig(), grid_level=args.grid_level
        )
    stl = args.stl or (os.path.splitext(args.design)[0].replace("/", "_") + ".stl")

    evaluator = None
    if args.sdf_field != "auto":
        from designcsg_tpu.evaluator import BatchEvaluator

        evaluator = BatchEvaluator(
            scene, use_pallas=(args.sdf_field == "baked")
        )

    monitor = ExportMonitor(out=sys.stdout)
    t0 = time.time()
    mesh, report = export_mesh(
        scene,
        config,
        stl_path=stl,
        ply_path=args.ply,
        evaluator=evaluator,
        progress=monitor,
        resume_dir=args.resume_dir,
        strategy=args.strategy,
    )
    print(
        f"exported {report.num_triangles} triangles "
        f"({report.num_vertices} vertices) in {time.time()-t0:.1f}s "
        f"(sdf field: {report.stats.get('sdf_field', 'tape-exact')})"
    )
    for stage, secs in report.stage_seconds.items():
        print(f"  {stage:<14s} {secs:7.2f}s")
    histogram = monitor.render_histogram(report.stats)
    if histogram and args.histogram:
        print(histogram)
    print(f"wrote {stl}" + (f" and {args.ply}" if args.ply else ""))


def cmd_artifacts(args):
    from designcsg_tpu import api

    # Builds through the script path so the compiler instance is available.
    if args.design.lower() in ("design1", "design2", "logo"):
        import designs as _designs

        c = api.new_design()
        module = importlib.import_module(f"designs.{args.design.lower()}")
        module.build(compiler=c)
    else:
        load_design(args.design)
        c = api.current()
    os.makedirs(args.directory, exist_ok=True)
    c.write_artifacts(args.directory)
    print(f"wrote scene.txt / buildprocedure.txt / arbitrary_data.hex to {args.directory}")


def cmd_fit(args):
    import jax.numpy as jnp
    import numpy as np

    from designcsg_tpu.config import RenderConfig
    from designcsg_tpu.parallel.fit import make_fit_harness, save_checkpoint

    scene = load_design(args.design)
    config = RenderConfig(
        width=args.width,
        height=args.height,
        max_steps=128,
        differentiable=True,
        soft_silhouette_bandwidth=0.02,
        gizmo=False,
        fit_field=args.field,
    )
    cam = _camera(args)
    campos, rgt, upp, fwd = cam.as_arrays()
    harness = make_fit_harness(scene, config)
    target = harness.render_target(scene.arrays, campos, rgt, upp, fwd)

    rng = np.random.default_rng(args.seed)
    start = np.asarray(scene.arrays.position).copy()
    start[1:] += rng.normal(scale=args.perturb, size=start[1:].shape)
    state = harness.init({"position": jnp.asarray(start)})
    print(f"fitting {args.steps} steps on {harness.mesh.devices.size if harness.mesh else 1} device(s)")
    for i in range(args.steps):
        state, loss = harness.step_fn(state, target, campos, rgt, upp, fwd)
        if (i + 1) % max(1, args.steps // 10) == 0:
            err = float(
                jnp.abs(state.params["position"] - scene.arrays.position).max()
            )
            print(f"step {i+1:4d}  loss {float(loss):.3e}  max pos err {err:.4f}")
    os.makedirs(args.output, exist_ok=True)
    save_checkpoint(os.path.join(args.output, "fit.ckpt"), state)
    print(f"wrote {args.output}/fit.ckpt")


def cmd_preview(args):
    """Screenshot-style render of an exported mesh (STL/PLY) to PNG.

    The reference's workflow screenshots exports in an external viewer
    (README.md:15-16); this is the built-in equivalent
    (export/preview.py)."""
    import numpy as np

    from designcsg_tpu.export.preview import (
        fill_background_pinholes,
        rasterize_mesh,
    )
    from designcsg_tpu.export.writers import read_ply, read_stl

    path = args.mesh
    mesh = read_ply(path) if path.lower().endswith(".ply") else read_stl(path)
    a, e = np.radians(args.azimuth), np.radians(args.elevation)
    view = np.array(
        [np.sin(a) * np.cos(e), -np.sin(e), np.cos(a) * np.cos(e)]
    )
    img = rasterize_mesh(mesh, view_dir=view, size=args.size)
    img = fill_background_pinholes(img)
    try:
        from PIL import Image
    except ImportError:
        raise SystemExit("preview needs pillow (pip install pillow)")
    Image.fromarray(img).save(args.out)
    print(
        f"{args.out}: {mesh.num_faces} triangles at az {args.azimuth} "
        f"el {args.elevation}"
    )


def cmd_bench(args):
    import bench

    bench.main()


def cmd_studio(args):
    from designcsg_tpu.studio import serve

    serve(
        args.workspace,
        port=args.port,
        width=args.width,
        height=args.height,
        backend=args.backend,
    )


def main(argv=None):
    parser = argparse.ArgumentParser(prog="designcsg_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("render", help="sphere-trace a design to a PNG")
    p.add_argument("design")
    p.add_argument("-o", "--output", default="render.png")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--orbit", type=float, nargs=2, metavar=("DA", "DB"))
    p.add_argument("--zoom", type=float, default=0.0)
    p.add_argument("--no-gizmo", action="store_true")
    p.add_argument("--no-default-orbit", action="store_true")
    p.add_argument("--backend", choices=["jnp", "pallas"], default="jnp")
    p.add_argument(
        "--fast",
        action="store_true",
        help="over-relaxed + hierarchical march (pallas backend)",
    )
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser(
        "watch", help="re-render a design script whenever it changes"
    )
    p.add_argument("design")
    p.add_argument("-o", "--output", default="render.png")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--orbit", type=float, nargs=2, metavar=("DA", "DB"))
    p.add_argument("--zoom", type=float, default=0.0)
    p.add_argument("--no-gizmo", action="store_true")
    p.add_argument("--no-default-orbit", action="store_true")
    p.add_argument("--backend", choices=["jnp", "pallas"], default="jnp")
    p.add_argument("--poll", type=float, default=0.5)
    p.add_argument(
        "--max-renders",
        type=int,
        default=0,
        help="stop after N renders (0 = run until interrupted)",
    )
    p.set_defaults(fn=cmd_watch)

    p = sub.add_parser("export", help="mesh-export a design (STL/PLY)")
    p.add_argument("design")
    p.add_argument("--stl")
    p.add_argument("--ply")
    p.add_argument("--grid-level", type=int)
    p.add_argument("--resume-dir")
    p.add_argument(
        "--strategy",
        choices=["auto", "active", "dense", "compact", "adaptive"],
        default="auto",
    )
    p.add_argument(
        "--sdf-field",
        choices=["auto", "exact", "baked"],
        default="auto",
        help="SDF field the export evaluates: exact tape (reference k2 "
        "semantics), the baked kernel-twin field, or the evaluator's "
        "auto choice (exact for approximate-twin scenes)",
    )
    p.add_argument(
        "--histogram",
        action="store_true",
        help="print the per-slab/per-level triangle histogram after export",
    )
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("artifacts", help="emit reference-format IR files")
    p.add_argument("design")
    p.add_argument("-d", "--directory", default=".")
    p.set_defaults(fn=cmd_artifacts)

    p = sub.add_parser("fit", help="differentiable shape-fit demo")
    p.add_argument("design")
    p.add_argument("-o", "--output", default="fit_out")
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--height", type=int, default=48)
    p.add_argument("--perturb", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--orbit", type=float, nargs=2)
    p.add_argument("--zoom", type=float, default=0.0)
    p.add_argument(
        "--field",
        choices=["exact", "twin"],
        default="exact",
        help="SDF field for gradient attachment (twin: baked kernel-twin "
        "field — order-of-magnitude cheaper backward on baked-twin "
        "scenes, pose/transform gradients only)",
    )
    p.set_defaults(fn=cmd_fit)

    p = sub.add_parser(
        "preview", help="screenshot-style PNG of an exported STL/PLY mesh"
    )
    p.add_argument("mesh", help="path to .stl or .ply")
    p.add_argument("out", nargs="?", default="preview.png")
    p.add_argument("--azimuth", type=float, default=-30.0)
    p.add_argument("--elevation", type=float, default=-15.0)
    p.add_argument("--size", type=int, default=512)
    p.set_defaults(fn=cmd_preview)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser(
        "studio", help="browser-based editor/viewport/export shell"
    )
    p.add_argument("workspace", nargs="?", default="designs_workspace")
    p.add_argument("--port", type=int, default=8642)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument(
        "--backend", choices=["auto", "jnp", "pallas"], default="auto"
    )
    p.set_defaults(fn=cmd_studio)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
