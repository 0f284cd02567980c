from toroidal_ray_tracing_tpu.geom import triangle, torus, bvh  # noqa: F401
