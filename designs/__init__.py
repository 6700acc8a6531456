"""Example designs — the framework's "model zoo".

Each module exposes ``build(compiler=None) -> CompiledScene``; these are ports
of the reference example designs (reference: /root/reference/master/Designs/)
re-expressed as JAX brush functions, and serve as the golden integration
models (render + export regression tests, benchmarks).
"""

from __future__ import annotations


def get_design(name: str):
    """Build a design by name ('design1' | 'design2' | 'logo')."""
    name = name.lower()
    if name == "design1":
        from . import design1

        return design1.build()
    if name == "design2":
        from . import design2

        return design2.build()
    if name == "logo":
        from . import logo

        return logo.build()
    raise KeyError(f"unknown design {name!r}")
