from toroidal_ray_tracing_tpu.cameras.pinhole import PinholeCamera  # noqa: F401
from toroidal_ray_tracing_tpu.cameras.toroidal import ToroidalCamera  # noqa: F401


def generate_rays(camera, width, height, settings, xp=None, jitter=None):
    """Dispatch to the camera's ray generator. Returns (origins, dirs) as
    (H*W, 3) float32 arrays in row-major image order (i = y*W + x)."""
    return camera.generate_rays(width, height, settings, xp=xp, jitter=jitter)
