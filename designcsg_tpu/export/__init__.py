from .active import extract_surface_active  # noqa: F401
from .adaptive import extract_surface_adaptive  # noqa: F401
from .compact import extract_surface_compact  # noqa: F401
from .pipeline import autodetect_bounding_box, export_mesh  # noqa: F401
from .retopo import (  # noqa: F401
    boundary_edges,
    merge_meshes,
    retopologize,
    stitch_boundary_loops,
)
from .writers import write_ply, write_stl  # noqa: F401
