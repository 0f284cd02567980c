from toroidal_ray_tracing_tpu.io import dumps  # noqa: F401
