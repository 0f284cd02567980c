from toroidal_ray_tracing_tpu.pointcloud.splat import splat_points  # noqa: F401
