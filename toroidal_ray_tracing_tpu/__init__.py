"""toroidal_ray_tracing_tpu — a TPU-native toroidal-capture ray-tracing framework.

A from-scratch JAX / Pallas / pjit re-design of the capabilities of
`raffaelecicellini/toroidal_ray_tracing` (a Vulkan-KHR fork of NVIDIA's
vk_raytracing_tutorial_KHR):

* toroidal + pinhole camera models            (VKT/ray_tracing__before/shaders/raytrace.rgen:19-57,
                                               VKT/ray_tracing_reflections/shaders/raytrace.rgen:42-48)
* triangle-mesh scenes with OBJ/MTL loading   (VKT/ray_tracing__before/hello_vulkan.cpp:190-247)
* two-level (BLAS/TLAS-like) instancing       (VKT/ray_tracing__before/hello_vulkan.cpp:602-687)
* Lambert + Phong shading, hard shadows,
  iterative specular reflections              (VKT/ray_tracing__before/shaders/raytrace.rchit:26-135,
                                               wavefront.glsl:23-50)
* capture / point-cloud-reprojection /
  ground-truth experiment tooling             (VKT/ray_tracing__before/hello_vulkan.cpp:991-1259,
                                               VKT/ray_tracing__before_second/*)
* analytic torus primitive (quartic solve)    (extension required by BASELINE.json)

The Vulkan RT hardware pipeline is replaced by a pure-functional wavefront
renderer: ray generation, intersection, and shading are pure functions over a
ray-state pytree, stepped by `lax.while_loop`; the hot closest-hit query is a
flash-attention-style Pallas kernel (Woop-transformed triangles on the MXU,
online argmin reduction in VMEM). Multi-chip scaling uses a 2D
`jax.sharding.Mesh` (rays = data parallel, primitives = "tensor" parallel with
a psum-min combine).
"""

__version__ = "0.1.0"

from toroidal_ray_tracing_tpu.scene.types import (  # noqa: F401
    Material,
    Light,
    RenderSettings,
    TriangleMesh,
    Instance,
    Scene,
    Torus,
)
from toroidal_ray_tracing_tpu.cameras import PinholeCamera, ToroidalCamera  # noqa: F401
from toroidal_ray_tracing_tpu.render.renderer import render  # noqa: F401
