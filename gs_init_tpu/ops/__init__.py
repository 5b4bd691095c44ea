from . import projection, rasterize_ref, sh  # noqa: F401
