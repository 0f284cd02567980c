from toroidal_ray_tracing_tpu.trace.intersect import Hit, closest_hit, any_hit  # noqa: F401
from toroidal_ray_tracing_tpu.trace.wavefront import trace_rays  # noqa: F401
