"""Scene data layer: BVH build, procedural geometry, OBJ IO, triangle gather.

Counterpart of the reference's `src/scene/` (Model/Mesh/BVH;
reference: include/scene/mesh.h, include/scene/model.h, src/scene/bvh.cpp).
"""

from .bvh import BVH, BVHArrays, build_bvh, bvh_to_arrays
from .geometry import (make_plane, make_uv_sphere, make_icosphere, make_bunny,
                       gather_triangles, load_obj, save_obj)
