from zeldaengine_tpu.scene.world import (
    World,
    CameraDesc,
    LightDesc,
    ObjectDesc,
    RenderFlags,
)
from zeldaengine_tpu.scene.mesh import Mesh, load_obj, make_cube, make_sphere, make_plane

__all__ = [
    "World",
    "CameraDesc",
    "LightDesc",
    "ObjectDesc",
    "RenderFlags",
    "Mesh",
    "load_obj",
    "make_cube",
    "make_sphere",
    "make_plane",
]
