from zeldaengine_tpu.meshlet.build import build_meshlets, MeshletSet, Meshlet
from zeldaengine_tpu.meshlet.io import save_meshlet_set, load_meshlet_set

__all__ = [
    "build_meshlets",
    "MeshletSet",
    "Meshlet",
    "save_meshlet_set",
    "load_meshlet_set",
]
