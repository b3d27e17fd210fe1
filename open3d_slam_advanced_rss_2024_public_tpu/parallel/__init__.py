from . import mesh  # noqa: F401
from .mesh import make_mesh, DATA_AXIS  # noqa: F401
