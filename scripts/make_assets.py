"""Generate the asset set the reference expects but does not ship.

The reference loads models/{plane,bunny_lp,sphere}.obj and
cubemaps/*.png (reference: src/app/application.cpp:260-304) but the
snapshot contains neither directory (SURVEY.md §4) — assets must be
re-provisioned.  This script writes procedural equivalents:

  models/plane.obj     ground quad
  models/sphere.obj    unit UV sphere
  models/bunny_lp.obj  bunny-like blob (~5k tris)
  models/cube.obj      unit cube (extra test model)
  cubemaps/sky_day.png   4x3-cross: gradient sky + sun disk
  cubemaps/sky_dusk.png  4x3-cross: warm dusk variant
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")

from opengl_raytracing_tpu.scene.geometry import (make_plane, make_uv_sphere,
                                                  make_bunny, save_obj)
from opengl_raytracing_tpu.utils.image import write_png, CROSS_LAYOUT
from opengl_raytracing_tpu.utils.log import log


def make_cube():
    v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                  for z in (-1, 1)], np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def face_dirs(face: int, size: int):
    """World direction for each texel of a GL cubemap face (matching the
    sampler face/uv math in ops/cubemap.py)."""
    t, s = np.meshgrid((np.arange(size) + 0.5) / size * 2 - 1,
                       (np.arange(size) + 0.5) / size * 2 - 1,
                       indexing="ij")
    o = np.ones_like(s)
    # face order +X,-X,+Y,-Y,+Z,-Z with GL sc/tc conventions inverted
    if face == 0:
        d = np.stack([o, -t, -s], -1)
    elif face == 1:
        d = np.stack([-o, -t, s], -1)
    elif face == 2:
        d = np.stack([s, o, t], -1)
    elif face == 3:
        d = np.stack([s, -o, -t], -1)
    elif face == 4:
        d = np.stack([s, -t, o], -1)
    else:
        d = np.stack([-s, -t, -o], -1)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def sky_color(d, sun_dir, horizon, zenith, sun_col, sun_sharp=400.0,
              clip=True):
    y = np.clip(d[..., 1], -1, 1)
    t = np.clip(0.5 * (y + 1.0), 0, 1) ** 0.8
    base = horizon[None, None] * (1 - t[..., None]) + zenith[None, None] * t[..., None]
    cos_sun = np.clip((d * sun_dir).sum(-1), 0, 1)
    sun = np.exp(sun_sharp * (cos_sun - 1.0))[..., None] * sun_col[None, None]
    ground = (np.array([0.25, 0.22, 0.2])[None, None]
              * (0.4 + 0.6 * np.clip(-y, 0, 1))[..., None])
    base = np.where(y[..., None] < 0, ground, base)
    out = base + sun
    return np.clip(out, 0, 1) if clip else out


def write_cross(path, size, sun_dir, horizon, zenith, sun_col):
    cross = np.zeros((3 * size, 4 * size, 3), np.float32)
    sun_dir = np.asarray(sun_dir, np.float64)
    sun_dir /= np.linalg.norm(sun_dir)
    hdr = path.endswith((".hdr", ".exr"))
    for face in range(6):
        d = face_dirs(face, size)
        img = sky_color(d, sun_dir, np.asarray(horizon), np.asarray(zenith),
                        np.asarray(sun_col), clip=not hdr)
        cx, cy = CROSS_LAYOUT[face]
        cross[cy * size:(cy + 1) * size, cx * size:(cx + 1) * size] = img
    if path.endswith(".hdr"):
        from opengl_raytracing_tpu.utils.image import write_hdr
        write_hdr(path, cross)  # linear radiance, no 8-bit clip
    elif path.endswith(".exr"):
        from opengl_raytracing_tpu.utils.image import write_exr
        write_exr(path, cross)  # linear half-float scanlines, ZIP
    else:
        write_png(path, cross)


def main():
    os.makedirs("models", exist_ok=True)
    os.makedirs("cubemaps", exist_ok=True)
    save_obj("models/plane.obj", make_plane(10.0))
    save_obj("models/sphere.obj", make_uv_sphere(1.0))
    save_obj("models/bunny_lp.obj", make_bunny(4))
    save_obj("models/cube.obj", make_cube())
    log("MESH", "wrote models/{plane,sphere,bunny_lp,cube}.obj")
    # non-OBJ formats so every importer is reachable from the model
    # picker (reference scans models/* via assimp, gui.cpp:721-799)
    from opengl_raytracing_tpu.scene.geometry import make_icosphere
    from opengl_raytracing_tpu.scene.importers import (save_stl, save_ply,
                                                       save_glb, save_dae,
                                                       save_3ds, save_fbx)
    save_stl("models/ico.stl", make_icosphere(1.0, 3))
    save_ply("models/blob.ply", make_bunny(3))
    save_glb("models/orb.glb", make_uv_sphere(1.0, 16, 32))
    save_dae("models/gem.dae", make_icosphere(1.0, 2))
    save_3ds("models/knot.3ds", make_uv_sphere(1.0, 12, 24))
    save_fbx("models/torus.fbx", make_uv_sphere(0.8, 10, 20))
    log("MESH", "wrote models/ico.stl + blob.ply + orb.glb + gem.dae "
        "+ knot.3ds + torus.fbx")
    write_cross("cubemaps/sky_day.png", 64, (0.4, 0.55, 0.35),
                (0.75, 0.85, 0.95), (0.25, 0.45, 0.85), (2.0, 1.9, 1.6))
    write_cross("cubemaps/sky_dusk.png", 64, (0.8, 0.15, 0.2),
                (0.9, 0.55, 0.35), (0.15, 0.15, 0.4), (2.2, 1.2, 0.7))
    # HDR variant: sun radiance well above 1.0 survives (linear RGBE)
    write_cross("cubemaps/sky_noon.hdr", 64, (0.1, 0.9, 0.2),
                (0.8, 0.88, 0.97), (0.3, 0.5, 0.9), (6.0, 5.6, 4.8))
    # EXR variant: half-float ZIP scanlines through the same picker path
    write_cross("cubemaps/sky_storm.exr", 64, (-0.5, 0.4, -0.3),
                (0.45, 0.48, 0.55), (0.12, 0.14, 0.2), (3.5, 3.4, 3.0))
    log("ENV", "wrote cubemaps/{sky_day,sky_dusk}.png + sky_noon.hdr "
        "+ sky_storm.exr (4x3 cross, 64px)")
    # JPEG variant so the picker's *.jpg pattern is reachable (we decode
    # but do not encode JPEG; PIL is a fixture-generation dependency
    # only, same as in tests)
    try:
        from PIL import Image
        Image.open("cubemaps/sky_day.png").convert("RGB").save(
            "cubemaps/sky_day.jpg", quality=95)
        log("ENV", "wrote cubemaps/sky_day.jpg")
    except ImportError:
        log("ENV", "PIL unavailable; skipped cubemaps/sky_day.jpg")


if __name__ == "__main__":
    main()
