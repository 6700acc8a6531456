from .pipeline import autodetect_bounding_box, export_mesh  # noqa: F401
from .writers import write_ply, write_stl  # noqa: F401
