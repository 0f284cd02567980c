from toroidal_ray_tracing_tpu.experiments import configs  # noqa: F401
