"""Scene pytrees — the TPU-native replacement for the reference's descriptor
sets, push constants and device buffers.

The reference keeps scene state as Vulkan buffers addressed through `ObjDesc`
(VKT/ray_tracing__before/shaders/host_device.h:59-66), camera matrices in a
`GlobalUniforms` UBO (host_device.h:69-75) and per-frame knobs in
`PushConstantRay` (host_device.h:90-98). Here all of that becomes plain JAX
pytrees:

* `Material`   — SoA clone of `WaveFrontMaterial` (host_device.h:117-129)
* `Light` + `RenderSettings` — clone of `PushConstantRay`
* `TriangleMesh` / `Instance` — the BLAS/TLAS analog
  (BLAS per OBJ model: hello_vulkan.cpp:602-663; TLAS instances with
  `instanceCustomIndex = objIndex`: hello_vulkan.cpp:668-687)
* `Torus`      — analytic torus primitive batch (BASELINE.json extension; the
  reference has no procedural primitive, SURVEY.md §0)
* `Scene`      — trace-ready flattened device scene (world-space triangles with
  precomputed Woop transforms + torus batch + material/texture tables)

Everything is float32 / int32; shapes are static so the whole struct jits.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Any

import jax.numpy as jnp
import numpy as np
from flax import struct

F32 = np.float32
I32 = np.int32

LIGHT_POINT = 0     # VKT/ray_tracing__before/shaders/raytrace.rchit:61-67
LIGHT_INFINITE = 1  # raytrace.rchit:68-71

ILLUM_DIFFUSE_ONLY = 0   # no ambient add (wavefront.glsl:28)
ILLUM_AMBIENT = 1        # ambient added, no specular (wavefront.glsl:36)
ILLUM_PHONG = 2          # ambient + Phong specular
ILLUM_REFLECTIVE = 3     # mirror reflection chain (raytrace.rchit:123)


class Material(NamedTuple):
    """SoA material table, one row per material (WaveFrontMaterial,
    host_device.h:117-129)."""

    ambient: Any        # (M, 3) f32
    diffuse: Any        # (M, 3) f32
    specular: Any       # (M, 3) f32
    transmittance: Any  # (M, 3) f32
    emission: Any       # (M, 3) f32
    shininess: Any      # (M,)  f32
    ior: Any            # (M,)  f32
    dissolve: Any       # (M,)  f32
    illum: Any          # (M,)  i32
    texture_id: Any     # (M,)  i32  (-1 = none; raytrace.rchit:79)

    @staticmethod
    def table(rows: "list[dict]") -> "Material":
        """Build a material table from a list of dicts of WaveFront fields."""

        def col(key, default, width=None):
            vals = []
            for r in rows:
                v = r.get(key, default)
                vals.append(v)
            arr = np.asarray(vals)
            if width is not None:
                arr = arr.reshape(len(rows), width).astype(F32)
            return arr

        return Material(
            ambient=col("ambient", (0.1, 0.1, 0.1), 3),
            diffuse=col("diffuse", (0.7, 0.7, 0.7), 3),
            specular=col("specular", (1.0, 1.0, 1.0), 3),
            transmittance=col("transmittance", (0.0, 0.0, 0.0), 3),
            emission=col("emission", (0.0, 0.0, 0.0), 3),
            shininess=col("shininess", 0.0).astype(F32),
            ior=col("ior", 1.0).astype(F32),
            dissolve=col("dissolve", 1.0).astype(F32),
            illum=col("illum", 2).astype(I32),
            texture_id=col("texture_id", -1).astype(I32),
        )


class Light(NamedTuple):
    """Point or infinite light (raytrace.rchit:57-71)."""

    position: Any    # (3,) f32 — position (point) or direction (infinite)
    intensity: Any   # ()   f32
    type: Any        # ()   i32 — LIGHT_POINT | LIGHT_INFINITE


class RenderSettings(NamedTuple):
    """Per-frame knobs: clone of `PushConstantRay` (host_device.h:90-98) plus
    framework extensions (AA sampling for config 5)."""

    clear_color: Any      # (4,) f32
    light: Light
    max_depth: Any        # () i32 — bounce cap (reference default 10, hello_vulkan.h:153)
    rho: Any              # () f32 — toroidal ring radius (reference sweep 4..10)
    pixel_spread: Any = F32(0.0)  # () f32 — world-units-per-unit-distance
    # footprint of one pixel, used for texture mip LOD selection (the
    # hardware sampler's derivative-based LOD analog). 0 = sample level 0;
    # render()/render_oracle() auto-fill it from the camera, matching the
    # reference's always-mipmapped sampler (hello_vulkan.cpp:315-318)

    @staticmethod
    def default(
        clear_color=(1.0, 1.0, 1.0, 1.0),
        light_position=(10.0, 15.0, 8.0),
        light_intensity=100.0,
        light_type=LIGHT_POINT,
        max_depth=10,
        rho=4.0,
        pixel_spread=0.0,
    ) -> "RenderSettings":
        return RenderSettings(
            clear_color=np.asarray(clear_color, dtype=F32),
            light=Light(
                position=np.asarray(light_position, dtype=F32),
                intensity=F32(light_intensity),
                type=I32(light_type),
            ),
            max_depth=I32(max_depth),
            rho=F32(rho),
            pixel_spread=F32(pixel_spread),
        )


# ---------------------------------------------------------------------------
# Host-side scene description (the "loadModel + instances" level)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TriangleMesh:
    """One OBJ model == one BLAS (hello_vulkan.cpp:602-663).

    NumPy host arrays; flattened into the device `Scene` by
    `toroidal_ray_tracing_tpu.scene.build.build_scene`.
    """

    positions: np.ndarray        # (V, 3) f32
    normals: np.ndarray          # (V, 3) f32
    colors: np.ndarray           # (V, 3) f32 (vertex colors; reference Vertex.color)
    uvs: np.ndarray              # (V, 2) f32
    indices: np.ndarray          # (T, 3) i32
    mat_index: np.ndarray        # (T,)  i32 — per-triangle material (MatIndices buffer)
    materials: list              # list[dict] WaveFront fields for Material.table
    textures: list = dataclasses.field(default_factory=list)  # list[np.ndarray (H,W,3) f32]

    @property
    def num_triangles(self) -> int:
        return int(self.indices.shape[0])


@dataclasses.dataclass
class Torus:
    """Analytic torus primitive: axis +y in object space, centered at origin.

    Implicit surface (x^2+y^2+z^2 + R^2 - r^2)^2 = 4 R^2 (x^2+z^2).
    Not present in the reference (SURVEY.md §0) — required by BASELINE.json.
    """

    major_radius: float
    minor_radius: float
    materials: list              # list[dict] (single-entry typical)
    mat_index: int = 0


@dataclasses.dataclass
class Instance:
    """TLAS instance: object index + world transform
    (hello_vulkan.cpp:668-687; `instanceCustomIndex = objIndex`)."""

    obj_index: int
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=F32)
    )


@dataclasses.dataclass
class SceneDef:
    """Host scene graph: models + instances, the analog of the reference's
    `loadModel` call sequence (VKT/ray_tracing__before/main.cpp:200-212)."""

    models: list = dataclasses.field(default_factory=list)      # list[TriangleMesh | Torus]
    instances: list = dataclasses.field(default_factory=list)   # list[Instance]

    def add_model(self, model, transform: Optional[np.ndarray] = None) -> int:
        """Mirror of `HelloVulkan::loadModel(file, transform)`
        (hello_vulkan.cpp:190-247): registers the model and creates one
        instance for it."""
        idx = len(self.models)
        self.models.append(model)
        self.instances.append(
            Instance(obj_index=idx, transform=np.eye(4, dtype=F32) if transform is None else np.asarray(transform, dtype=F32))
        )
        return idx

    def add_instance(self, obj_index: int, transform: np.ndarray) -> int:
        self.instances.append(Instance(obj_index=obj_index, transform=np.asarray(transform, dtype=F32)))
        return len(self.instances) - 1


# ---------------------------------------------------------------------------
# Device-side trace-ready scene
# ---------------------------------------------------------------------------


class TriangleSoup(NamedTuple):
    """Flattened world-space triangles, padded to a static count T.

    The Woop arrays turn closest-hit queries into two thin matmuls
    (MXU-friendly): with `oh = [o, 1]` (N,4) and `d` (N,3),

        o' = oh @ woop_o   -> (N, 3T) -> reshape (N, 3, T)
        d' = d  @ woop_d   -> (N, 3T)

    then per (ray, tri): t = -o'z/d'z, u = o'x + t d'x, v = o'y + t d'y and
    the hit test is u>=0, v>=0, u+v<=1 (Woop et al. unit-triangle test). This
    is the TPU-native replacement for the driver BVH + `traceRayEXT`
    (raytrace.rgen:77).
    """

    v0: Any          # (T, 3) f32
    e1: Any          # (T, 3) f32  (v1 - v0)
    e2: Any          # (T, 3) f32  (v2 - v0)
    n0: Any          # (T, 3) f32  vertex normals (world space)
    n1: Any          # (T, 3)
    n2: Any          # (T, 3)
    uv0: Any         # (T, 2)
    uv1: Any         # (T, 2)
    uv2: Any         # (T, 2)
    c0: Any          # (T, 3) per-vertex colors (Vertex.color,
    c1: Any          #   host_device.h:109-115 — carried for ABI parity;
    c2: Any          #   the reference's RT path never samples them either)
    mat_id: Any      # (T,) i32 into the global material table
    instance_id: Any # (T,) i32 (instanceCustomIndex analog)
    valid: Any       # (T,) bool — False for padding rows
    woop_o: Any      # (3, 4, T) f32: component k <- [o,1] @ woop_o[k]
    woop_d: Any      # (3, 3, T) f32: component k <- d @ woop_d[k]

    @property
    def count(self) -> int:
        return int(self.v0.shape[0])


class TorusSoup(NamedTuple):
    """Batch of analytic tori (world transforms kept explicit — the TLAS
    analog for procedural AABB instances)."""

    world_to_obj: Any   # (K, 3, 4) f32 (rotation+scale | translation)
    obj_to_world: Any   # (K, 3, 4) f32
    major_radius: Any   # (K,) f32
    minor_radius: Any   # (K,) f32
    mat_id: Any         # (K,) i32
    instance_id: Any    # (K,) i32
    valid: Any          # (K,) bool
    center: Any         # (K, 3) f32 world-space center (for culling)
    bound_radius: Any   # (K,) f32 world-space bounding-sphere radius

    @property
    def count(self) -> int:
        return int(self.major_radius.shape[0])


class TextureAtlas(NamedTuple):
    """All scene textures + full mip chains packed into one flat texel
    buffer (replaces the `sampler2D textureSamplers[]` binding,
    raytrace.rchit:22; mip generation mirrors nvvk::cmdGenerateMipmaps,
    hello_vulkan.cpp:339). A single white texel if the scene has none
    (hello_vulkan.cpp:292-309).

    Level l of texture i occupies rows `offsets[i, l] : offsets[i, l] +
    h*w` of `data`, row-major, with (h, w) = sizes[i, l]. Entries beyond
    n_levels[i] duplicate the last level (so LOD clamping needs no
    branches).

    Texels are stored quad-packed AND quantized to the reference's own
    texture precision (`data4q`): row t holds the 2x2 texel neighbourhood
    whose top-left corner is texel t — taps [c(y,x), c(y,x+1), c(y+1,x),
    c(y+1,x+1)] with repeat (wrap) addressing baked in at pack time, tap k
    in byte k of each channel's u32 word. Two reasons, both measured on
    hardware:

    * one (N, 3) row-gather fetches all four bilinear taps of a mip level
      (vs four separate tap gathers);
    * gather cost scales with the gathered table's residency, not its row
      width (~7 ms / 2M rows for a VMEM-resident table vs ~50 ms
      HBM-resident; sorting indices does NOT help) — so the 12-byte u32
      rows (vs 48-byte f32 quads) keep realistic atlases 4x closer to the
      fast regime. Measured: 2M trilinear samples from a 1M-texel atlas =
      ~26 ms packed (decode included) vs ~100 ms f32-quad vs ~160 ms
      4-tap.

    Quantization is NOT a fidelity loss vs the reference: its textures are
    `VK_FORMAT_R8G8B8A8_SRGB` (hello_vulkan.cpp:289) — 8-bit gamma-encoded
    texels that the sampler hardware decodes to linear f32 before
    filtering, which is byte-for-byte the scheme here (gamma 2.2, the
    loader's sRGB->linear convention; decode after gather, before the
    bilinear blend). 8-bit sources round-trip the pack exactly.

    The f32 views (`data4`, `data`) decode on demand — host numpy or
    traced XLA ops, never a second stored buffer."""

    offsets: Any   # (n_tex, L) i32
    sizes: Any     # (n_tex, L, 2) i32 — (height, width) per level
    n_levels: Any  # (n_tex,) i32
    data4q: Any    # (total_texels, 3) u32 — wrap-packed 2x2 quads, sRGB u8

    @property
    def data4(self):
        """(total_texels, 12) linear-f32 quad view (tap-major: t00 rgb,
        t10 rgb, t01 rgb, t11 rgb)."""
        xp = jnp if not isinstance(self.data4q, np.ndarray) else np
        return xp.concatenate(
            [tex_dequant(self.data4q, tap) for tap in range(4)], axis=-1)

    @property
    def data(self):
        """(total_texels, 3) linear-f32 texel table view (top-left tap)."""
        return tex_dequant(self.data4q, 0)


def tex_dequant(words, tap: int):
    """Byte `tap` of packed u32 channel words -> linear f32 in [0, 1].

    The sampler-hardware sRGB decode (gamma 2.2 — matching the loaders'
    sRGB->linear convention for material colors). Shared by the atlas f32
    views and the post-gather decode in trace/shade so gather-then-decode
    is bitwise decode-then-gather."""
    b = (words >> np.uint32(8 * tap)) & np.uint32(0xFF)
    c = b.astype(np.float32) * np.float32(1.0 / 255.0)
    return c ** np.float32(2.2)


@struct.dataclass
class Scene:
    """Fully flattened device scene: what `traceRayEXT` + descriptor sets see.

    `cluster_*` fields carry the host-built acceleration structure (§ BVH):
    triangles are sorted into fixed-size clusters with AABBs so the Pallas
    kernel can skip whole clusters per ray tile. `cluster_size` is static
    (not a pytree leaf) so kernels can use it for tiling under jit.
    """

    triangles: TriangleSoup
    tori: TorusSoup
    materials: Material
    textures: TextureAtlas
    # acceleration: cluster AABBs over the *sorted* triangle array
    cluster_lo: Any        # (C, 3) f32 — min corner per cluster
    cluster_hi: Any        # (C, 3) f32
    cluster_size: int = struct.field(pytree_node=False, default=256)
    # "loose" triangles: big, spatially fat primitives from nearly-empty
    # clusters (e.g. a 2-triangle ground plane whose whole-floor AABB every
    # downward ray tile visits — measured 38.8% of all cluster dispatches on
    # the 23k-tri mesh ladder scene). The builder compacts them to the LAST
    # `loose_tris` live rows of the triangle table (whole tail clusters);
    # the Pallas orchestrator hoists them into a dense XLA prepass and
    # culls the tail clusters outright (ops/trace_kernel.closest_hit_pallas).
    # Static so the hoist's shapes are jit-constant; 0 = no loose region.
    loose_tris: int = struct.field(pytree_node=False, default=0)

    @property
    def num_triangles(self) -> int:
        return self.triangles.count

    @property
    def num_tori(self) -> int:
        return self.tori.count
