from .active import extract_surface_active  # noqa: F401
from .pipeline import autodetect_bounding_box, export_mesh  # noqa: F401
from .retopo import merge_meshes, retopologize  # noqa: F401
from .writers import write_ply, write_stl  # noqa: F401
