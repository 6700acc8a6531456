from .interpreter import (  # noqa: F401
    make_primary_sdf,
    make_dynamic_primary_sdf,
    make_normal_fn,
    brute_force_min_sdf,
)
