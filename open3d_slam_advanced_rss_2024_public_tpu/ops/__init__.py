from . import croppers, filters, generators, hashgrid, normals  # noqa: F401
