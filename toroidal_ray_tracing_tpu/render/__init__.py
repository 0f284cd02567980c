from toroidal_ray_tracing_tpu.render.renderer import (render,  # noqa: F401
                                                      render_frames,
                                                      render_sequence,
                                                      tonemap)
from toroidal_ray_tracing_tpu.render.raster import raster_render  # noqa: F401
