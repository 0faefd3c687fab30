"""ctypes bindings for the native C++ runtime components.

Builds `libortnative.so` on demand with g++ (cached next to this file) and
exposes `build_bvh`, `load_obj`, `gather_triangles`, `slice_cubemap_cross`
with the same contracts as the numpy implementations in scene/ and utils/.
`available()` reports whether the native path is usable; callers fall back
to numpy automatically.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "bvh_native.cpp"),
         os.path.join(_DIR, "image_native.cpp")]
_LIB_PATH = os.path.join(_DIR, "libortnative.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build_library(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed.  Returns path or None."""
    global _build_failed
    with _lock:
        if (not force and os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) >= max(
                    os.path.getmtime(s) for s in _SRCS)):
            return _LIB_PATH
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", *_SRCS, "-o", _LIB_PATH]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            _build_failed = False
            return _LIB_PATH
        except Exception:
            _build_failed = True
            return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    c_fp = ctypes.POINTER(ctypes.c_float)
    c_ip = ctypes.POINTER(ctypes.c_int32)
    c_up = ctypes.POINTER(ctypes.c_uint8)

    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [c_fp, ctypes.c_int, ctypes.c_int]
    lib.bvh_num_nodes.restype = ctypes.c_int
    lib.bvh_num_nodes.argtypes = [ctypes.c_void_p]
    lib.bvh_num_tris.restype = ctypes.c_int
    lib.bvh_num_tris.argtypes = [ctypes.c_void_p]
    lib.bvh_copy.argtypes = [ctypes.c_void_p, c_fp, c_fp, c_ip, c_ip, c_ip,
                             c_ip, c_ip, c_fp]
    lib.bvh_free.argtypes = [ctypes.c_void_p]

    lib.obj_load.restype = ctypes.c_void_p
    lib.obj_load.argtypes = [ctypes.c_char_p]
    lib.obj_num_verts.restype = ctypes.c_int
    lib.obj_num_verts.argtypes = [ctypes.c_void_p]
    lib.obj_num_faces.restype = ctypes.c_int
    lib.obj_num_faces.argtypes = [ctypes.c_void_p]
    lib.obj_copy.argtypes = [ctypes.c_void_p, c_fp, c_ip]
    lib.obj_free.argtypes = [ctypes.c_void_p]

    lib.gather_triangles.argtypes = [c_fp, ctypes.c_int, c_ip, ctypes.c_int,
                                     c_fp, c_fp]
    lib.cubemap_slice.restype = ctypes.c_int
    lib.cubemap_slice.argtypes = [c_up, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, c_fp]

    lib.png_unfilter.restype = ctypes.c_int
    lib.png_unfilter.argtypes = [c_up, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64, c_up]
    lib.hdr_unrle.restype = ctypes.c_int64
    lib.hdr_unrle.argtypes = [c_up, ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_int64, c_up]
    lib.jpeg_entropy_scan.restype = ctypes.c_int64
    lib.jpeg_entropy_scan.argtypes = [
        c_up, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, c_ip, c_ip,
        c_up, c_up, c_up, c_up, c_fp, ctypes.c_int32, c_fp]
    c_u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.jpeg_entropy_encode.restype = ctypes.c_int64
    lib.jpeg_entropy_encode.argtypes = [
        c_ip, c_up, ctypes.c_int64, c_u32p, c_up, c_u32p, c_up,
        c_up, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_bvh(tris: np.ndarray, leaf_max: int = 8):
    """Native median-split builder -> scene.bvh.BVH (same layout contract
    as the numpy builder; tree may differ in tie order, results identical).
    Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from ..scene.bvh import BVH

    tris = np.ascontiguousarray(tris, np.float32)
    n = tris.shape[0]
    h = lib.bvh_build(_fp(tris), n, leaf_max)
    nn = lib.bvh_num_nodes(h)
    nt = lib.bvh_num_tris(h)
    bmin = np.zeros((nn, 3), np.float32)
    bmax = np.zeros((nn, 3), np.float32)
    left = np.zeros(nn, np.int32)
    right = np.zeros(nn, np.int32)
    first = np.zeros(nn, np.int32)
    count = np.zeros(nn, np.int32)
    skip = np.zeros(nn, np.int32)
    out_tris = np.zeros((nt, 9), np.float32)
    if nn:
        lib.bvh_copy(h, _fp(bmin), _fp(bmax), _ip(left), _ip(right),
                     _ip(first), _ip(count), _ip(skip), _fp(out_tris))
    lib.bvh_free(h)
    return BVH(bmin, bmax, left, right, first, count, skip, out_tris)


def load_obj(path: str):
    """Native OBJ parse -> (verts [V,3] f32, faces [F,3] i32) or None."""
    lib = _load()
    if lib is None:
        return None
    h = lib.obj_load(path.encode())
    if not h:
        return None
    nv, nf = lib.obj_num_verts(h), lib.obj_num_faces(h)
    verts = np.zeros((nv, 3), np.float32)
    faces = np.zeros((nf, 3), np.int32)
    lib.obj_copy(h, _fp(verts), _ip(faces))
    lib.obj_free(h)
    return verts, faces


def gather_triangles(mesh, transform: np.ndarray):
    """Native world-space triangle gather -> [T,9] f32 or None."""
    lib = _load()
    if lib is None:
        return None
    verts, faces = mesh
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    m = np.ascontiguousarray(transform, np.float32)
    out = np.zeros((faces.shape[0], 9), np.float32)
    lib.gather_triangles(_fp(verts), verts.shape[0], _ip(faces),
                         faces.shape[0], _fp(m), _fp(out))
    return out


def slice_cubemap_cross(img: np.ndarray):
    """Native 4x3-cross slicer -> [6,F,F,3] f32 or None."""
    lib = _load()
    if lib is None:
        return None
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img, np.float64) * 255.0 + 0.5,
                      0, 255).astype(np.uint8)
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    f = h // 3
    out = np.zeros((6, f, f, 3), np.float32)
    r = lib.cubemap_slice(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c, _fp(out))
    if r < 0:
        raise ValueError(f"invalid cubemap cross dimensions {w}x{h}")
    return out


def _up(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def png_unfilter(raw: np.ndarray, h: int, w: int, c: int):
    """Native PNG scanline defilter -> [H,W,C] uint8 or None.

    `raw` is the zlib-inflated stream of h*(1+w*c) bytes.  Same contract
    as utils.image._unfilter_numpy (the oracle); raises on a bad filter
    byte exactly like it."""
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.zeros(h * w * c, np.uint8)
    r = lib.png_unfilter(_up(raw), h, w, c, _up(out))
    if r < 0:
        raise ValueError(f"bad filter {-r}")
    return out.reshape(h, w, c)


def jpeg_entropy_scan(data: np.ndarray, pos: int, mcux: int, mcuy: int,
                      hs: np.ndarray, vs: np.ndarray, dc_val, dc_len,
                      ac_val, ac_len, qts: np.ndarray,
                      restart_interval: int):
    """Native baseline-JPEG entropy decode -> dequantized natural-order
    coefficient blocks [n_blocks, 64] f32 (MCU-major, python-loop block
    order) or None.  LUT args are [nc, 65536] u8; qts is [nc, 64] f32 in
    zigzag order.  Raises ValueError on malformed streams exactly like
    utils.image._decode_block."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    hs = np.ascontiguousarray(hs, np.int32)
    vs = np.ascontiguousarray(vs, np.int32)
    nc = hs.shape[0]
    nblocks = mcux * mcuy * int(np.sum(hs * vs))
    coefs = np.zeros((nblocks, 64), np.float32)
    # keep contiguous copies alive across the call (ctypes pointers do
    # not hold references)
    dcv = np.ascontiguousarray(dc_val, np.uint8)
    dcl = np.ascontiguousarray(dc_len, np.uint8)
    acv = np.ascontiguousarray(ac_val, np.uint8)
    acl = np.ascontiguousarray(ac_len, np.uint8)
    qts = np.ascontiguousarray(qts, np.float32)
    r = lib.jpeg_entropy_scan(
        _up(data), data.shape[0], pos, mcux, mcuy, nc, _ip(hs), _ip(vs),
        _up(dcv), _up(dcl), _up(acv), _up(acl), _fp(qts),
        restart_interval, _fp(coefs))
    if r < 0:
        raise ValueError({-1: "bad DC huffman code",
                          -2: "bad AC huffman code",
                          -3: "AC index overflow"}.get(int(r),
                                                       f"jpeg error {r}"))
    return coefs


def jpeg_entropy_encode(blocks: np.ndarray, comp_ids: np.ndarray,
                        dc_codes: np.ndarray, dc_lens: np.ndarray,
                        ac_codes: np.ndarray, ac_lens: np.ndarray):
    """Native baseline-JPEG huffman ENCODE -> byte-stuffed entropy
    segment (bytes) or None.  blocks [N,64] int32 zigzag-quantized in
    MCU-interleaved scan order; comp_ids [N] u8 (0 = luma tables);
    code tables symbol-indexed [2,256] (u32 codes / u8 lengths).
    Oracle: utils.image._jenc_entropy_python."""
    lib = _load()
    if lib is None:
        return None
    blocks = np.ascontiguousarray(blocks, np.int32)
    comp_ids = np.ascontiguousarray(comp_ids, np.uint8)
    dcc = np.ascontiguousarray(dc_codes, np.uint32)
    dcl = np.ascontiguousarray(dc_lens, np.uint8)
    acc = np.ascontiguousarray(ac_codes, np.uint32)
    acl = np.ascontiguousarray(ac_lens, np.uint8)
    n = blocks.shape[0]
    # true worst case: 27-bit DC + 63 x 26-bit AC = ~209 bytes/block,
    # doubled by 0xFF byte-stuffing -> ~420; the C++ side returns -1 on
    # overflow (falls back to the python writer), so size for it
    cap = n * 430 + 1024
    out = np.zeros(cap, np.uint8)
    c_u32p = ctypes.POINTER(ctypes.c_uint32)
    r = lib.jpeg_entropy_encode(
        _ip(blocks), _up(comp_ids), n,
        dcc.ctypes.data_as(c_u32p), _up(dcl),
        acc.ctypes.data_as(c_u32p), _up(acl), _up(out), cap)
    if r < 0:
        return None
    return out[:int(r)].tobytes()


def hdr_unrle(data: np.ndarray, pos: int, h: int, w: int):
    """Native Radiance RLE scanline decode -> [H,W,4] uint8 RGBE or
    None; raises on malformed input like the python decoder."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    out = np.zeros(h * w * 4, np.uint8)
    r = lib.hdr_unrle(_up(data), data.shape[0], pos, h, w, _up(out))
    if r < 0:
        raise ValueError(f"malformed HDR RLE stream (code {r})")
    return out.reshape(h, w, 4)
