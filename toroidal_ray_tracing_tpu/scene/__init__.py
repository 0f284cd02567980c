from toroidal_ray_tracing_tpu.scene.types import (  # noqa: F401
    Instance,
    Light,
    Material,
    RenderSettings,
    Scene,
    SceneDef,
    TextureAtlas,
    Torus,
    TorusSoup,
    TriangleMesh,
    TriangleSoup,
    LIGHT_POINT,
    LIGHT_INFINITE,
)
from toroidal_ray_tracing_tpu.scene.build import build_scene, to_device  # noqa: F401
from toroidal_ray_tracing_tpu.scene.obj_loader import load_obj  # noqa: F401
from toroidal_ray_tracing_tpu.scene import procedural  # noqa: F401
