from toroidal_ray_tracing_tpu.utils import math3d  # noqa: F401
