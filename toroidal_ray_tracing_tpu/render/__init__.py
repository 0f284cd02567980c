from toroidal_ray_tracing_tpu.render.renderer import render, tonemap  # noqa: F401
