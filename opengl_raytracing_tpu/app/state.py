"""AppState: all engine runtime state in one place.

Counterpart of the reference's god-object (reference:
include/app/state.h:45-132): camera, params, frame state, accumulation,
scene assets (BVH model + env map), mode toggles, and picker state.
Device-resident pieces (RenderState) stay functional pytrees; this class
is the host-side owner that threads them through frames.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import time
from typing import List, Optional

import numpy as np

from ..camera import Camera
from ..frame_state import FrameState
from ..params import RenderParams
from ..models.pipeline import RenderState
from ..ops.scene import BVHDevice, prepare_bvh
from ..scene.geometry import gather_triangles_fast, model_transform
from ..scene.importers import load_model, MODEL_EXTENSIONS
from ..constants import DEFAULT_BVH_TRANSLATE, DEFAULT_BVH_SCALE
from ..utils.log import log
from ..utils.paths import resolve_dir


def _tris_aabb(tris: np.ndarray):
    """World-space AABB of a [T,9] (v0,e1,e2) triangle array."""
    t = np.asarray(tris, np.float64)
    v0, v1, v2 = t[:, 0:3], t[:, 0:3] + t[:, 3:6], t[:, 0:3] + t[:, 6:9]
    pts = np.concatenate([v0, v1, v2], axis=0)
    return pts.min(axis=0).astype(np.float32), \
        pts.max(axis=0).astype(np.float32)


@dataclasses.dataclass
class PickerState:
    """Directory-scan asset picker (reference: src/ui/gui.cpp:721-887)."""
    directory: str
    patterns: tuple
    entries: List[str] = dataclasses.field(default_factory=list)
    selected: int = -1
    reload_requested: bool = False

    def scan(self) -> List[str]:
        found: List[str] = []
        for pat in self.patterns:
            found += glob.glob(os.path.join(self.directory, pat))
        self.entries = sorted(found)
        return self.entries

    def request(self, index: int) -> None:
        if 0 <= index < len(self.entries):
            self.selected = index
            self.reload_requested = True


class AppState:
    """Everything the render loop needs between frames."""

    def __init__(self, height: int = 1080, width: int = 1920,
                 params: Optional[RenderParams] = None):
        self.height = height
        self.width = width
        self.params = params or RenderParams()
        self.prev_params = self.params
        self.camera = Camera()
        self.camera.aspect = width / height

        self.render_state = RenderState.create(height, width)
        # Host-side mirror of render_state.frame_index (+1 per ray frame,
        # 0 on reset) so the app loop can index the jitter sequence without
        # a blocking device readback every frame.
        self.host_frame_index = 0
        self.frame = FrameState.initial(self.camera.view_projection(),
                                        self.camera.position)

        # Mode toggles (reference: include/app/state.h:60-76)
        self.ray_mode = True
        self.use_bvh = False
        self.show_motion = False

        # Scene assets
        self.bvh: Optional[BVHDevice] = None
        self.bvh_node_count = 0
        self.bvh_tri_count = 0
        self.scene_aabb = None  # (bmin, bmax) numpy, for ordered auto
        self.env_map = None  # [6,F,F,3] or None

        # Pickers (reference: gui.cpp:721-799 models, :804-887 cubemaps).
        # The model surface covers every importer format (assimp analog,
        # reference: include/scene/model.h:108-115).
        self.model_picker = PickerState(
            resolve_dir("models"),
            tuple("*" + ext for ext in MODEL_EXTENSIONS)
            + tuple("*" + ext.upper() for ext in MODEL_EXTENSIONS))
        # same pattern surface as the reference env picker
        # (gui.cpp:806-838); all five formats decode via utils/image.py
        # (PNG / baseline JPEG / Radiance HDR / OpenEXR scanline).
        self.env_picker = PickerState(
            resolve_dir("cubemaps"),
            ("*.png", "*.PNG", "*.jpg", "*.jpeg", "*.JPG", "*.JPEG",
             "*.hdr", "*.HDR", "*.exr", "*.EXR"))
        self.model_picker.scan()
        self.env_picker.scan()

        # Timing / metrics (reference FPS meter: gui.cpp:206-207)
        self.frame_times_ms: List[float] = []
        self.last_frame_start = time.monotonic()

    # -- asset loading with graceful degradation
    # (reference: src/app/application.cpp:482-516) --

    def load_bvh_model(self, path: str,
                       transform: Optional[np.ndarray] = None) -> bool:
        """Load a model (obj/stl/ply/gltf/glb), build + upload the BVH;
        keep old state on failure
        (reference: src/app/application.cpp:496-499)."""
        try:
            mesh = load_model(path)
            if mesh[1].shape[0] == 0:
                raise ValueError("no faces")
            m = transform if transform is not None else model_transform(
                DEFAULT_BVH_TRANSLATE, DEFAULT_BVH_SCALE)
            tris = gather_triangles_fast(mesh, m)
            self.bvh = prepare_bvh(tris)
            self.bvh_tri_count = int(tris.shape[0])
            self.bvh_node_count = int(self.bvh.arrays.bounds.shape[0])
            self.scene_aabb = _tris_aabb(tris)
            log("BVH", "loaded %s: %d tris, %d nodes", path,
                self.bvh_tri_count, self.bvh_node_count)
            return True
        except Exception as exc:  # keep previous BVH
            log("BVH", "failed to load %s: %s (keeping previous)", path, exc)
            return False

    def set_bvh_from_tris(self, tris: np.ndarray) -> None:
        self.bvh = prepare_bvh(tris)
        self.bvh_tri_count = int(tris.shape[0])
        self.bvh_node_count = int(self.bvh.arrays.bounds.shape[0])
        self.scene_aabb = _tris_aabb(tris)

    def load_env_map(self, path: str) -> bool:
        """Load a 4x3-cross image (png/jpg/jpeg/hdr); keep previous
        texture on failure
        (reference: src/app/application.cpp:300-304,513-515)."""
        try:
            from .. import native
            from ..utils.image import read_image, slice_cubemap_cross
            img = read_image(path)
            faces = (native.slice_cubemap_cross(img)
                     if native.available() and img.dtype == np.uint8
                     else slice_cubemap_cross(img))
            import jax.numpy as jnp
            if img.dtype == np.uint8:
                # keep 8-bit sources as integer texels: the dtype is
                # trace-static, so sample_cubemap's 'auto' mode takes
                # the patch_u8 lowering (r4a: an_full 143 -> 51 ms)
                # with exact k/255 values (round repairs the f32
                # divide+multiply round trip)
                faces = np.clip(np.round(faces * 255.0), 0.0,
                                255.0).astype(np.uint8)
            self.env_map = jnp.asarray(faces)
            log("ENV", "loaded cubemap %s (%dx%d faces)", path,
                faces.shape[1], faces.shape[2])
            return True
        except Exception as exc:
            log("ENV", "failed to load %s: %s (keeping previous)", path, exc)
            return False

    def resize(self, height: int, width: int) -> None:
        """Recreate size-dependent buffers and keep camera aspect in sync
        (reference resize handler: src/app/application.cpp:216-231)."""
        self.height, self.width = height, width
        self.camera.aspect = width / height
        self.render_state = RenderState.create(height, width)
        self.host_frame_index = 0
        self.frame = FrameState.initial(self.camera.view_projection(),
                                        self.camera.position)
        log("INIT", "resized to %dx%d (accum + gbuffer recreated)",
            width, height)

    # -- accumulation control (reference: src/render/accum.cpp:98-102) --

    def restore_render_state(self, rs) -> None:
        """Install an externally loaded RenderState (snapshot resume),
        keeping host_frame_index in sync so the jitter sequence continues
        from the restored frame rather than restarting at 0."""
        self.render_state = rs
        self.host_frame_index = int(np.asarray(rs.frame_index))

    def reset_accumulation(self, reason: str = "") -> None:
        self.render_state = self.render_state.reset()
        self.host_frame_index = 0
        if reason:
            log("ACCUM", "reset (%s)", reason)

    def record_frame_time(self, frames: int = 1) -> float:
        """`frames` > 1 when one dispatch chained several accumulation
        frames (turbo): the stats window carries per-FRAME times so the
        fps overlay reports accumulation frames/s, not dispatches/s."""
        now = time.monotonic()
        dt = (now - self.last_frame_start) * 1e3
        self.last_frame_start = now
        self.frame_times_ms.extend([dt / frames] * frames)
        while len(self.frame_times_ms) > 240:
            self.frame_times_ms.pop(0)
        return dt

    @property
    def fps(self) -> float:
        if not self.frame_times_ms:
            return 0.0
        avg = np.mean(self.frame_times_ms[-60:])
        return 1000.0 / max(avg, 1e-6)
