from toroidal_ray_tracing_tpu.render.renderer import render, tonemap  # noqa: F401
from toroidal_ray_tracing_tpu.render.raster import raster_render  # noqa: F401
