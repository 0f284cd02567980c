"""Pinhole camera — port of the stock NVIDIA tutorial ray generation
(VKT/ray_tracing_reflections/shaders/raytrace.rgen:42-48):

    pixelCenter = gl_LaunchID.xy + 0.5
    d           = pixelCenter / gl_LaunchSize * 2 - 1
    origin      = viewInverse * (0,0,0,1)
    target      = projInverse * (d.x, d.y, 1, 1)
    direction   = viewInverse * (normalize(target.xyz), 0)

The view/projection matrices mirror `updateUniformBuffer`
(VKT/ray_tracing__before/hello_vulkan.cpp:58-100): perspectiveVK(fov, aspect,
0.1, 1000) and the CameraManipulator look-at matrix.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from toroidal_ray_tracing_tpu.utils import math3d

F32 = np.float32


def pixel_coords(xp, width: int, height: int, block: int = 1):
    """Pixel (px, py) for flat index i, float32.

    block > 1 emits pixels in block-major order (b x b tiles, row-major
    within and across tiles): consecutive ray indices then form compact
    screen patches, so the trace kernels' per-ray-tile culling sees tight
    frusta instead of full-width scanline bands. Callers un-swizzle with
    `block_unswizzle`."""
    i = xp.arange(width * height, dtype=np.int32)
    if block <= 1:
        return (i % width).astype(F32), (i // width).astype(F32)
    b = block
    wb = width // b
    blk = i // (b * b)
    off = i % (b * b)
    px = (blk % wb) * b + off % b
    py = (blk // wb) * b + off // b
    return px.astype(F32), py.astype(F32)


def pick_block(width: int, height: int) -> int:
    """Largest supported block size dividing both dimensions."""
    for b in (32, 24, 16, 12, 8, 6, 4, 3, 2):
        if width % b == 0 and height % b == 0:
            return b
    return 1


def block_unswizzle(xp, a, width: int, height: int, block: int):
    """(H*W, C) block-major -> (H, W, C) row-major."""
    c = a.shape[-1]
    if block <= 1:
        return a.reshape(height, width, c)
    b = block
    a = a.reshape(height // b, width // b, b, b, c)
    return xp.transpose(a, (0, 2, 1, 3, 4)).reshape(height, width, c)


def block_unswizzle_rows(xp, a, width: int, height: int, block: int):
    """(C, H*W) block-major rows -> (C, H, W) row-major, CHANNEL-MAJOR.

    The channels-last variant above must first transpose (C, N) -> (N, C),
    and every minor-dim-C array on TPU is lane-padded C -> 128 (measured
    ~2.5 ms of pure relayout per 2M-ray buffer — 4 buffers per frame put
    the batch front door 30% behind the sequence protocol, LADDER round 4).
    Keeping channels major, the unswizzle is a pure mid-dim permute of
    dense tiles: measured ~0 ms."""
    if block <= 1:
        return a.reshape(-1, height, width)
    b = block
    a = a.reshape(-1, height // b, width // b, b, b)
    return xp.transpose(a, (0, 1, 3, 2, 4)).reshape(-1, height, width)


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    eye: tuple = (10.0, 0.0, 0.0)     # reference default pose: lookat (0,0,0)
    center: tuple = (0.0, 0.0, 0.0)   # from (10,0,0) (main.cpp:123-133)
    up: tuple = (0.0, 1.0, 0.0)
    fov_deg: float = 60.0             # CameraManipulator default FOV
    near: float = 0.1
    far: float = 1000.0

    def pixel_spread(self, width: int, height: int) -> float:
        """World-units-per-unit-distance footprint of one pixel (vertical
        FOV over the pixel rows) — drives texture mip LOD selection."""
        import math
        return 2.0 * math.tan(math.radians(self.fov_deg) / 2.0) / height

    def matrices(self, aspect: float):
        view = math3d.look_at(self.eye, self.center, self.up)
        proj = math3d.perspective_vk(self.fov_deg, aspect, self.near, self.far)
        return view, proj, math3d.inverse(view), math3d.inverse(proj)

    def ray_params(self, width: int, height: int, settings=None):
        """Small dynamic arrays consumed by `device_rays` — pass these as jit
        arguments so animated cameras don't recompile per pose."""
        _, _, view_inv, proj_inv = self.matrices(width / height)
        return (view_inv.astype(F32), proj_inv.astype(F32))

    @staticmethod
    def device_rays(params, width: int, height: int, settings=None, xp=None,
                    jitter=None, block: int = 1, rows: bool = False):
        """Fully traceable raygen: pixel indices come from an on-device
        arange, so a jitted frame moves ZERO per-ray data over the host link
        (the old host-meshgrid path shipped ~16 MB per 1080p frame through
        the TPU tunnel — more wall-clock than the whole trace).

        rows=True emits (3, N) ray ROWS — the trace kernels' native layout;
        the math is component-wise, so rows come free (stack on axis 0)
        while the (N, 3) layout needs an interleaving transpose."""
        if xp is None:
            import jax.numpy as xp  # noqa: PLC0415
        view_inv, proj_inv = params

        px, py = pixel_coords(xp, width, height, block)
        if jitter is not None:
            px = px + jitter[:, 0]
            py = py + jitter[:, 1]
        else:
            px = px + F32(0.5)
            py = py + F32(0.5)
        dx = px / F32(width) * F32(2.0) - F32(1.0)
        dy = py / F32(height) * F32(2.0) - F32(1.0)

        # elementwise formulation (no matmul: TPU would default f32 matmuls
        # to bf16 MXU passes, which is far too coarse for ray directions)
        pi = xp.asarray(proj_inv)
        tc = [pi[j, 0] * dx + pi[j, 1] * dy + pi[j, 2] + pi[j, 3]
              for j in range(3)]
        tn = xp.sqrt(tc[0] * tc[0] + tc[1] * tc[1] + tc[2] * tc[2])
        tc = [c / tn for c in tc]
        vi = xp.asarray(view_inv)
        dc = [vi[j, 0] * tc[0] + vi[j, 1] * tc[1] + vi[j, 2] * tc[2]
              for j in range(3)]
        axis = 0 if rows else -1
        dirs = xp.stack(dc, axis=axis).astype(F32)
        origin = xp.broadcast_to(
            vi[:3, 3][:, None] if rows else vi[:3, 3][None, :],
            dirs.shape).astype(F32)
        return origin, dirs

    def generate_rays(self, width: int, height: int, settings=None, xp=None,
                      jitter=None):
        """Rays for every pixel, row-major (i = y*W + x). `jitter` is an
        optional (H*W, 2) array of subpixel offsets in [0,1) replacing the
        fixed +0.5 pixel center (for the jittered-AA config)."""
        params = self.ray_params(width, height, settings)
        return self.device_rays(params, width, height, settings, xp=xp,
                                jitter=jitter)
