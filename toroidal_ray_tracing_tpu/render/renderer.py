"""Top-level render entry point.

One call replaces the reference's whole per-frame command buffer
(`raytrace()` + offscreen image + RenderedData SSBO,
VKT/ray_tracing__before/hello_vulkan.cpp:936-958): generate rays for the
camera, run the wavefront bounce loop under `jit`, and return the image plus
the `RenderedData` quartet (pos / color / rayOrigin / rayDir,
shaders/host_device.h:101-107).

The returned image is *linear* color — identical to the offscreen RGBA32F
image the reference dumps (`writeColorImage`). `tonemap` applies the post
pass's gamma (post.frag:35-36) for display.
"""

from __future__ import annotations

import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from toroidal_ray_tracing_tpu.cameras import generate_rays
from toroidal_ray_tracing_tpu.scene.types import RenderSettings, Scene
from toroidal_ray_tracing_tpu.trace.wavefront import trace_rays

F32 = np.float32


@functools.partial(jax.jit, static_argnames=("backend",))
def _trace_jit(scene, settings, origins, dirs, backend="jnp"):
    return trace_rays(scene, settings, origins, dirs, backend=backend)


@functools.partial(jax.jit, static_argnames=("cam_cls", "width", "height",
                                             "backend", "use_jitter"))
def _frame_jit(scene, settings, cam_params, key, cam_cls, width, height,
               backend, use_jitter):
    """Raygen + wavefront trace fused in ONE jit: per-ray data never crosses
    the host link (the split raygen->device_put->trace path moved ~16 MB per
    1080p frame through the TPU tunnel — several times the trace itself).

    Rays are traced in block-major pixel order so each kernel ray tile is a
    compact screen patch (tight cull frusta) rather than a full-width
    scanline band; outputs are un-swizzled back to row-major (H, W, 3) on
    device. Returns image-shaped arrays."""
    from toroidal_ray_tracing_tpu.cameras.pinhole import (block_unswizzle,
                                                          pick_block)

    block = pick_block(width, height)
    if use_jitter:
        jitter = jax.random.uniform(key, (width * height, 2), F32)
    else:
        jitter = None
    # rows end-to-end: raygen emits (3, N), the bounce loop and kernels run
    # row-native, and each output transposes ONCE here (the old column
    # layout paid an XLA transpose per kernel call per bounce)
    origins, dirs = cam_cls.device_rays(cam_params, width, height, settings,
                                        xp=jnp, jitter=jitter, block=block,
                                        rows=True)
    color, hitpos, nrays = trace_rays(scene, settings, origins, dirs,
                                      backend=backend, rows=True)
    unsw = lambda a: block_unswizzle(jnp, a.T, width, height, block)  # noqa: E731
    return unsw(color), unsw(hitpos), unsw(origins), unsw(dirs), nrays


def tonemap(image):
    """Post-pass gamma (pow(color, 1/2.2), post.frag:35-36)."""
    return jnp.power(jnp.clip(image, 0.0, None), F32(1.0 / 2.2))


@functools.partial(jax.jit, static_argnames=("cam_cls", "width", "height",
                                             "backend", "spp", "keep_images",
                                             "group"))
def _sequence_jit(scene, settings, param_stack, key, cam_cls, width, height,
                  backend, spp, keep_images, group=1):
    n = width * height

    def frame(rays_total, inp):
        fidx, params = inp
        if group == 1:
            acc = None
            for s in range(max(spp, 1)):
                sub = jax.random.fold_in(key, fidx * spp + s)
                color, _, _, _, nr = _frame_jit.__wrapped__(
                    scene, settings, params, sub, cam_cls, width, height,
                    backend, s > 0)
                acc = color if acc is None else acc + color
                rays_total = rays_total + nr
            img = (acc / F32(max(spp, 1))).reshape(height, width, 3)
            # the probe is a full reduction so XLA cannot slice away
            # per-pixel shading work when images aren't kept
            return rays_total, (img if keep_images else jnp.mean(img))

        # frame batching: `group` frames' rays concatenate into ONE
        # wavefront (frame id = lane block). A 256^2 frame is 72k rays —
        # it underfills the kernels' 2048-ray tiles across the bounce
        # loop's 3 dispatch stages; batching restores full tiles without
        # changing any per-frame semantics (the scene is static across
        # the sequence; only camera params vary per lane block).
        from toroidal_ray_tracing_tpu.cameras.pinhole import (block_unswizzle,
                                                              pick_block)

        block = pick_block(width, height)
        os, ds = [], []
        for g in range(group):
            p_g = jax.tree_util.tree_map(lambda x: x[g], params)
            o, d = cam_cls.device_rays(p_g, width, height, settings,
                                       xp=jnp, jitter=None, block=block,
                                       rows=True)
            os.append(o)
            ds.append(d)
        o = jnp.concatenate(os, axis=1)              # (3, group*n)
        d = jnp.concatenate(ds, axis=1)
        color, _, nr = trace_rays(scene, settings, o, d, backend=backend,
                                  rows=True)
        imgs = []
        for g in range(group):
            c = color[:, g * n:(g + 1) * n]
            imgs.append(block_unswizzle(jnp, c.T, width, height,
                                        block).reshape(height, width, 3))
        img = jnp.stack(imgs)                        # (group, H, W, 3)
        probe = img if keep_images else jnp.mean(img, axis=(1, 2, 3))
        return rays_total + nr, probe

    n_frames = jax.tree_util.tree_leaves(param_stack)[0].shape[0]
    if group > 1:
        assert spp <= 1, "frame batching requires spp == 1"
        assert n_frames % group == 0, (n_frames, group)
        steps = n_frames // group
        param_stack = jax.tree_util.tree_map(
            lambda x: x.reshape((steps, group) + x.shape[1:]), param_stack)
        fidx = jnp.arange(n_frames).reshape(steps, group)
    else:
        steps = n_frames
        fidx = jnp.arange(n_frames)
    total, images = jax.lax.scan(
        frame, jnp.float32(0), (fidx, param_stack))
    if group > 1:
        images = images.reshape((n_frames,) + images.shape[2:])
    return total, images


def render_sequence(scene, cameras, width, height, settings=None,
                    backend: str = "jnp", spp: int = 1, seed: int = 0,
                    keep_images: bool = True,
                    frames_per_batch: int | None = None):
    """Render an animated frame sequence inside ONE jit.

    The reference's experiment loop renders 60 frames per rho step with the
    camera animating between them (VKT/ray_tracing__before/main.cpp:269-403,
    CameraManip.updateAnim at :296) — the GPU pipelines frames without host
    round trips. This is the TPU equivalent: camera parameters for all
    frames are stacked and a `lax.scan` steps raygen + the wavefront trace
    per frame on device, so sustained throughput is not gated on the
    per-dispatch host RTT (≈40 ms on the TPU tunnel — dominant for small
    frames).

    cameras: list of camera objects of one class (one per frame).
    keep_images: False returns only the ray counter (+ a (F,3) probe pixel
    per frame) — use for throughput measurement or when F x H x W x 3 would
    not fit HBM.
    frames_per_batch: trace this many frames' rays as ONE wavefront batch
    per scan step (None = auto: enough frames to fill ~2M-ray dispatches,
    capped by divisibility into the frame count; 1 disables). Small frames
    otherwise underfill the kernels' 2048-ray tiles — a 256^2 frame is
    only 36 tiles across a 3-stage bounce loop.

    Returns {"images": (F, H, W, 3) linear color (if keep_images),
             "rays_traced": total float}.
    """
    if settings is None:
        settings = RenderSettings.default()
    settings = autofill_pixel_spread(settings, cameras[0], width, height)
    scene = _as_device_scene(scene)
    cam_cls = type(cameras[0])
    n_frames = len(cameras)
    group = frames_per_batch
    if group is None:
        if spp > 1:
            group = 1
        else:
            # fill ~2M-ray dispatches; group must divide the frame count
            target = max(1, (2 * 1024 * 1024) // max(width * height, 1))
            group = 1
            for g in range(2, n_frames + 1):
                if n_frames % g == 0 and g <= target:
                    group = g
    params = [c.ray_params(width, height, settings) for c in cameras]
    # stack on the HOST and upload once: eager jnp.stack/asarray here would
    # issue ~2 device ops per frame, and in sync-dispatch mode (any process
    # that has fetched a result — see bench.py) EACH pays the tunnel RTT:
    # a 240-frame stack measured ~480 ms of pure dispatch, 5x the render
    stack = jax.device_put(jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *params))
    total, images = _sequence_jit(scene, settings, stack,
                                  jax.random.PRNGKey(seed), cam_cls, width,
                                  height, backend, spp, keep_images,
                                  group=group)
    out = {"rays_traced": total}
    if keep_images:
        out["images"] = images
    return out


@functools.partial(jax.jit, static_argnames=("cam_cls", "width", "height",
                                             "backend", "spp", "dumps",
                                             "group"))
def _frames_jit(scene, settings, param_stack, key, cam_cls, width, height,
                backend, spp, dumps, group=1):
    """K frames scanned inside ONE jit, each returning the FULL RenderedData
    quartet (unlike _sequence_jit's throughput probe) in CHANNEL-MAJOR
    (3, H, W) layout. One host dispatch per batch instead of per frame —
    the ~40 ms tunnel RTT amortizes over the whole batch.

    Channel-major outputs are a measured necessity, not a taste choice: a
    channels-last (H, W, 3) device array is lane-padded 3 -> 128 on TPU,
    and materializing one costs ~2.5 ms of relayout per 2M-ray buffer —
    x4 buffers x F frames put the batch front door 30% behind the
    sequence protocol (scripts/batch_gap_diag.py). (3, H, W) materializes
    for free, and a host-side np.moveaxis view restores channels-last at
    zero copies.

    group > 1 (spp == 1 only): trace `group` frames' rays as ONE wavefront
    per scan step — small frames underfill the kernels' 2048-ray tiles
    across the bounce stages (_sequence_jit's frame batching, now with the
    full per-frame output set)."""
    from toroidal_ray_tracing_tpu.cameras.pinhole import pick_block

    block = pick_block(width, height)
    n = width * height

    def frame(rays_total, inp):
        fidx, params = inp
        plist = ([params] if group == 1 else
                 [jax.tree_util.tree_map(lambda x: x[g], params)
                  for g in range(group)])
        if group == 1:
            acc = hitpos = None
            for s in range(max(spp, 1)):
                sub = jax.random.fold_in(key, fidx * spp + s)
                jitter = (jax.random.uniform(sub, (n, 2), F32) if s > 0
                          else None)
                oo, dd = cam_cls.device_rays(params, width, height,
                                             settings, xp=jnp,
                                             jitter=jitter, block=block,
                                             rows=True)
                color, hp, nr = trace_rays(scene, settings, oo, dd,
                                           backend=backend, rows=True)
                acc = color if acc is None else acc + color
                rays_total = rays_total + nr
                if s == 0:
                    hitpos = hp
            color_cat, hit_cat = acc / F32(max(spp, 1)), hitpos
        else:
            os_l, ds_l = [], []
            for p_g in plist:
                oo, dd = cam_cls.device_rays(p_g, width, height, settings,
                                             xp=jnp, jitter=None,
                                             block=block, rows=True)
                os_l.append(oo)
                ds_l.append(dd)
            o = jnp.concatenate(os_l, axis=1)        # (3, group*n)
            d = jnp.concatenate(ds_l, axis=1)
            color_cat, hit_cat, nr = trace_rays(scene, settings, o, d,
                                                backend=backend, rows=True)
            rays_total = rays_total + nr

        # color+hitpos unswizzle as ONE permute over the WHOLE group (a
        # per-frame loop costs group x 4 extra ops per scan step — at 72k
        # rays/frame the op dispatches, not the bytes, were the batch
        # column's residual); the ray origin/dir dumps REGENERATE
        # row-major (block=1: the unswizzle is then a free reshape)
        # instead of permuting the traced block-major rays — raygen math
        # is cheaper than a relayout, and the s=0 rays are jitter-free so
        # the regenerated buffers are bit-identical
        G = group

        def unsw_group(a):
            """(C, G*n) block-major rows -> (G, C, H, W) row-major."""
            C = a.shape[0]
            if block <= 1:
                return a.reshape(C, G, height, width).swapaxes(0, 1)
            b = block
            a = a.reshape(C, G, height // b, width // b, b, b)
            return jnp.transpose(a, (1, 0, 2, 4, 3, 5)).reshape(
                G, C, height, width)

        if not dumps:
            out_t = (unsw_group(color_cat),)
        else:
            six = unsw_group(jnp.concatenate([color_cat, hit_cat], axis=0))
            ros, rds = [], []
            for p_g in plist:
                ro, rd = cam_cls.device_rays(p_g, width, height, settings,
                                             xp=jnp, jitter=None, block=1,
                                             rows=True)
                ros.append(ro.reshape(3, height, width))
                rds.append(rd.reshape(3, height, width))
            out_t = (six[:, 0:3], six[:, 3:6], jnp.stack(ros),
                     jnp.stack(rds))
        if group == 1:
            return rays_total, tuple(a[0] for a in out_t)
        return rays_total, out_t

    n_frames = jax.tree_util.tree_leaves(param_stack)[0].shape[0]
    if group > 1:
        assert spp <= 1, "frame grouping requires spp == 1"
        assert n_frames % group == 0, (n_frames, group)
        steps = n_frames // group
        param_stack = jax.tree_util.tree_map(
            lambda x: x.reshape((steps, group) + x.shape[1:]), param_stack)
        fidx = jnp.arange(n_frames).reshape(steps, group)
    else:
        fidx = jnp.arange(n_frames)
    total, outs = jax.lax.scan(frame, jnp.float32(0), (fidx, param_stack))
    if group > 1:
        outs = tuple(a.reshape((n_frames,) + a.shape[2:]) for a in outs)
    return total, outs


def render_frames(scene, cameras, width, height, settings=None,
                  backend: str = "jnp", spp: int = 1, seed: int = 0,
                  dumps: bool = True, frames_per_batch: int | None = None):
    """Render a batch of frames in ONE device dispatch — the multi-frame
    front door.

    `render()` pays the host-link dispatch round trip (~40 ms on the TPU
    tunnel, which dominates small frames) once PER FRAME; this pays it once
    per BATCH while still returning every frame's full output set (unlike
    `render_sequence(keep_images=...)`, which returns color images only —
    this is the one to use when the per-step dumps of the capture workflow
    are needed at sustained throughput, e.g. the rho sweep's 13 steps).

    cameras: a list of camera objects of one class (one per frame), or a
    single camera (rendered `spp`-jittered once — pass a list of repeated
    cameras for an explicit multi-frame batch of the same pose).
    dumps: False skips the per-frame hit_position / ray buffers (images
    only) — use for large batches where F x 4 x 3 x H x W f32 would press
    on HBM (a 8-frame 4K batch with dumps is ~3.2 GB).
    frames_per_batch: trace this many frames' rays as ONE wavefront per
    scan step (None = auto: fill ~2M-ray dispatches for small frames; 1
    disables). Small frames otherwise underfill the trace kernels' ray
    tiles per bounce stage.

    Outputs are CHANNEL-MAJOR device arrays — (F, 3, H, W): channels-last
    (H, W, 3) arrays are lane-padded 3 -> 128 on TPU and cost ~2.5 ms of
    pure relayout per 2M-ray buffer to materialize (measured,
    scripts/batch_gap_diag.py), while (3, H, W) is free. On the host,
    `np.moveaxis(np.asarray(a), 1, -1)` restores channels-last as a
    zero-copy view.

    Returns {"images": (F, 3, H, W) linear color,
             "hit_positions" / "ray_origins" / "ray_dirs": (F, 3, H, W)
             (when dumps=True), "rays_traced": total float}.
    """
    if not isinstance(cameras, (list, tuple)):
        cameras = [cameras]
    if settings is None:
        settings = RenderSettings.default()
    settings = autofill_pixel_spread(settings, cameras[0], width, height)
    scene = _as_device_scene(scene)
    cam_cls = type(cameras[0])
    n_frames = len(cameras)
    group = frames_per_batch
    if group is None:
        group = 1
        if spp <= 1:
            # fill ~2M-ray wavefronts; group must divide the frame count
            target = max(1, (2 * 1024 * 1024) // max(width * height, 1))
            for g in range(2, n_frames + 1):
                if n_frames % g == 0 and g <= target:
                    group = g
    params = [c.ray_params(width, height, settings) for c in cameras]
    # host-stack + one upload (eager per-frame device ops pay the RTT each;
    # see render_sequence)
    stack = jax.device_put(jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *params))
    total, outs = _frames_jit(scene, settings, stack,
                              jax.random.PRNGKey(seed), cam_cls, width,
                              height, backend, spp, dumps, group=group)
    out = {"images": outs[0], "rays_traced": total}
    if dumps:
        out["hit_positions"] = outs[1]
        out["ray_origins"] = outs[2]
        out["ray_dirs"] = outs[3]
    return out


def autofill_pixel_spread(settings, camera, width, height):
    """Fill RenderSettings.pixel_spread from the camera when unset (0) —
    the reference's sampler is always mipmapped (hello_vulkan.cpp:315-339),
    so textured renders mip by default. Pass pixel_spread=-1 (any negative)
    to force level-0 sampling."""
    try:
        ps = float(np.asarray(settings.pixel_spread))
    except (TypeError, jax.errors.TracerArrayConversionError):
        return settings  # traced: caller manages it
    if ps == 0.0 and hasattr(camera, "pixel_spread"):
        return settings._replace(
            pixel_spread=F32(camera.pixel_spread(width, height)))
    if ps < 0.0:
        return settings._replace(pixel_spread=F32(0.0))
    return settings


_device_scene_cache: dict = {}


def _as_device_scene(scene):
    """Device-resident view of the scene, cached per scene object.

    Numpy pytree args are re-uploaded on EVERY jit call; over the TPU tunnel
    (~17 MB/s host link) that re-upload dwarfs the render. Cache the
    device placement keyed on object identity, evicted when the host scene
    is garbage collected."""
    leaves = jax.tree_util.tree_leaves(scene)
    if all(isinstance(leaf, jax.Array) for leaf in leaves):
        return scene
    key = id(scene)
    hit = _device_scene_cache.get(key)
    if hit is not None and hit[0]() is scene:
        return hit[1]
    dev = jax.device_put(scene)
    ref = weakref.ref(scene,
                      lambda _r, k=key: _device_scene_cache.pop(k, None))
    _device_scene_cache[key] = (ref, dev)
    return dev


def _render_banded(scene, camera, width, height, settings, backend, spp,
                   seed, out_sharding, tile_rows):
    """Row-band rendering: bounds the live ray-state footprint in HBM.

    Everything stays on device — bands of equal height share one compiled
    executable, outputs accumulate per band and concatenate at the end (no
    per-band host round trips)."""
    n = width * height
    key = jax.random.PRNGKey(seed)
    bands = [(y0, min(tile_rows, height - y0))
             for y0 in range(0, height, tile_rows)]

    def shard(a):
        # place each band's ray slice sharded so the banded path composes
        # with data parallelism (it previously ignored out_sharding and ran
        # the whole frame on one device)
        return a if out_sharding is None else jax.device_put(a, out_sharding)

    band_color = [None] * len(bands)
    band_hit = [None] * len(bands)
    nrays = jnp.asarray(0.0, F32)
    orig0 = dir0 = None
    for s in range(max(spp, 1)):
        if s == 0:
            jitter = None
        else:
            key, sub = jax.random.split(key)
            jitter = jax.random.uniform(sub, (n, 2), F32)
        o_full, d_full = generate_rays(camera, width, height, settings,
                                       jitter=jitter)
        if s == 0:
            orig0, dir0 = o_full, d_full
        for bi, (y0, rows) in enumerate(bands):
            sl = slice(y0 * width, (y0 + rows) * width)
            c, hp, nr = _trace_jit(scene, settings, shard(o_full[sl]),
                                   shard(d_full[sl]), backend)
            band_color[bi] = c if band_color[bi] is None else band_color[bi] + c
            nrays = nrays + nr
            if s == 0:
                band_hit[bi] = hp
    color = jnp.concatenate(band_color) / F32(max(spp, 1))
    hitpos = jnp.concatenate(band_hit)
    shape = (height, width, 3)
    return {
        "image": color.reshape(shape),
        "hit_position": hitpos.reshape(shape),
        "ray_origin": orig0.reshape(shape),
        "ray_dir": dir0.reshape(shape),
        "rays_traced": nrays,
    }


def _render_with_sharding(scene, camera, width, height, settings, backend,
                          spp, seed, out_sharding):
    """Split raygen + device_put path for explicitly sharded ray batches."""
    origins, dirs = generate_rays(camera, width, height, settings)
    origins = jax.device_put(origins, out_sharding)
    dirs = jax.device_put(dirs, out_sharding)

    if spp <= 1:
        color, hitpos, nrays = _trace_jit(scene, settings, origins, dirs,
                                          backend)
    else:
        rng = np.random.default_rng(seed)
        acc = hitpos = None
        nrays = 0.0
        for s in range(spp):
            if s == 0:
                jitter = None  # center sample also provides hit/ray dumps
            else:
                jitter = jax.device_put(
                    jnp.asarray(rng.random((width * height, 2),
                                           dtype=np.float32)), out_sharding)
            o, d = generate_rays(camera, width, height, settings,
                                 jitter=jitter)
            if jitter is not None:
                o = jax.device_put(o, out_sharding)
                d = jax.device_put(d, out_sharding)
            else:
                o, d = origins, dirs
            c, hp, nr = _trace_jit(scene, settings, o, d, backend)
            acc = c if acc is None else acc + c
            nrays = nrays + nr
            if s == 0:
                hitpos = hp
        color = acc / F32(spp)

    shape = (height, width, 3)
    return {
        "image": color.reshape(shape),
        "hit_position": hitpos.reshape(shape),
        "ray_origin": origins.reshape(shape),
        "ray_dir": dirs.reshape(shape),
        "rays_traced": nrays,
    }


def render(
    scene: Scene,
    camera,
    width: int,
    height: int,
    settings: RenderSettings | None = None,
    backend: str = "jnp",
    spp: int = 1,
    seed: int = 0,
    out_sharding=None,
    tile_rows: int | None = None,
):
    """Render one frame.

    backend: "jnp" (reference path) or "pallas" (fused kernel fast path).
    spp: samples per pixel; >1 enables jittered AA (BASELINE config 5 —
         framework extension, the reference is strictly 1 spp).
    out_sharding: optional NamedSharding for the flat ray batch; when given,
         rays are placed sharded and the whole trace runs SPMD over the mesh
         (pure data parallelism — the scene is replicated, cf. SURVEY.md §2C).
    tile_rows: render the image in horizontal bands of this many rows
         (bounds device memory for very large frames, e.g. 4K; the per-band
         jit is reused when height % tile_rows == 0).

    Returns a dict: image, hit_position, ray_origin, ray_dir — each (H, W, 3).
    """
    if settings is None:
        settings = RenderSettings.default()
    settings = autofill_pixel_spread(settings, camera, width, height)
    if out_sharding is None:
        scene = _as_device_scene(scene)

    if tile_rows is not None and tile_rows < height:
        return _render_banded(scene, camera, width, height, settings,
                              backend, spp, seed, out_sharding, tile_rows)

    if out_sharding is not None:
        # explicit data-parallel placement: keep the split raygen path so
        # the ray batch lands with the requested sharding
        return _render_with_sharding(scene, camera, width, height, settings,
                                     backend, spp, seed, out_sharding)

    cam_params = camera.ray_params(width, height, settings)
    cam_cls = type(camera)
    key = jax.random.PRNGKey(seed)
    if spp <= 1:
        color, hitpos, origins, dirs, nrays = _frame_jit(
            scene, settings, cam_params, key, cam_cls, width, height,
            backend, False)
    else:
        acc = hitpos = origins = dirs = None
        nrays = 0.0
        for s in range(spp):
            # center sample first (also provides the hit/ray dumps)
            c, hp, o, d, nr = _frame_jit(
                scene, settings, cam_params, jax.random.fold_in(key, s),
                cam_cls, width, height, backend, s > 0)
            acc = c if acc is None else acc + c
            nrays = nrays + nr
            if s == 0:
                hitpos, origins, dirs = hp, o, d
        color = acc / F32(spp)

    shape = (height, width, 3)
    return {
        "image": color.reshape(shape),
        "hit_position": hitpos.reshape(shape),
        "ray_origin": origins.reshape(shape),
        "ray_dir": dirs.reshape(shape),
        "rays_traced": nrays,
    }
