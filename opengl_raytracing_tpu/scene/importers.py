"""Multi-format model import: OBJ, STL, PLY, glTF 2.0 (.gltf/.glb).

Parity target: the reference imports models through assimp's ReadFile
with Triangulate | JoinIdenticalVertices (reference:
include/scene/model.h:108-115), which accepts many formats; only
positions and connectivity matter downstream (normals are recomputed
from the triangle edges in the BVH gather).  `load_model` dispatches by
extension; every loader returns the package Mesh contract
(verts [V,3] f32, faces [F,3] i32) with polygon fans triangulated,
exactly like the OBJ path (scene/geometry.py:135-158).
"""

from __future__ import annotations

import base64
import json
import os
import struct

import numpy as np

from .geometry import Mesh, load_obj_fast

MODEL_EXTENSIONS = (".obj", ".stl", ".ply", ".gltf", ".glb")


def load_model(path: str) -> Mesh:
    """Load any supported model format by extension.

    Raises ValueError on unsupported extensions and on malformed files
    (the caller keeps the previous model on failure, same graceful
    degradation as the reference's BVH-load failure path,
    reference: src/app/application.cpp:496-499)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return load_obj_fast(path)
    if ext == ".stl":
        return load_stl(path)
    if ext == ".ply":
        return load_ply(path)
    if ext in (".gltf", ".glb"):
        return load_gltf(path)
    raise ValueError(f"unsupported model format: {ext!r} ({path})")


# -----------------------------------------------------------------------------
# STL (binary + ASCII)
# -----------------------------------------------------------------------------

def load_stl(path: str) -> Mesh:
    """STL reader.  Binary STL stores 50-byte records (normal + 3 verts +
    attribute count); ASCII starts with 'solid' and vertex lines.  STL has
    no shared vertices, so faces index a flat 3T vertex list."""
    with open(path, "rb") as fh:
        head = fh.read(84)
        if len(head) >= 84:
            (count,) = struct.unpack("<I", head[80:84])
            expect = 84 + count * 50
            if os.path.getsize(path) == expect and count > 0:
                fh.seek(84)
                raw = np.frombuffer(fh.read(count * 50), np.uint8)
                rec = raw.reshape(count, 50)
                floats = rec[:, 0:48].copy().view("<f4").reshape(count, 12)
                verts = floats[:, 3:12].reshape(count * 3, 3)
                faces = np.arange(count * 3, dtype=np.int32).reshape(-1, 3)
                return verts.astype(np.float32), faces
    # ASCII fallback
    verts = []
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        for line in fh:
            t = line.split()
            if len(t) == 4 and t[0] == "vertex":
                verts.append([float(t[1]), float(t[2]), float(t[3])])
    if not verts or len(verts) % 3:
        raise ValueError(f"malformed STL: {path}")
    v = np.asarray(verts, np.float32)
    return v, np.arange(len(v), dtype=np.int32).reshape(-1, 3)


def save_stl(path: str, mesh: Mesh) -> None:
    """Binary STL writer (fixture/export helper)."""
    verts, faces = mesh
    tris = verts[faces]                                  # [F,3,3]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(struct.pack("<I", len(faces)))
        for i in range(len(faces)):
            fh.write(np.concatenate([n[i], tris[i].reshape(-1)])
                     .astype("<f4").tobytes())
            fh.write(b"\0\0")


# -----------------------------------------------------------------------------
# PLY (ASCII + binary_little_endian)
# -----------------------------------------------------------------------------

_PLY_TYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def load_ply(path: str) -> Mesh:
    """PLY reader: ascii and binary_little_endian, vertex x/y/z + face
    vertex index lists (fans triangulated)."""
    with open(path, "rb") as fh:
        if fh.readline().strip() != b"ply":
            raise ValueError(f"not a PLY file: {path}")
        fmt = None
        elements = []  # (name, count, [(prop_kind, dtype(s), name)])
        while True:
            line = fh.readline()
            if not line:
                raise ValueError(f"truncated PLY header: {path}")
            t = line.decode("ascii", "replace").split()
            if not t or t[0] == "comment":
                continue
            if t[0] == "format":
                fmt = t[1]
            elif t[0] == "element":
                elements.append((t[1], int(t[2]), []))
            elif t[0] == "property":
                if t[1] == "list":
                    elements[-1][2].append(
                        ("list", (_PLY_TYPES[t[2]], _PLY_TYPES[t[3]]), t[4]))
                else:
                    elements[-1][2].append(
                        ("scalar", _PLY_TYPES[t[1]], t[2]))
            elif t[0] == "end_header":
                break
        if fmt not in ("ascii", "binary_little_endian"):
            raise ValueError(f"unsupported PLY format {fmt!r}: {path}")
        verts, faces = None, []
        for name, count, props in elements:
            if fmt == "ascii":
                rows = [fh.readline().split() for _ in range(count)]
                if name == "vertex":
                    cols = {p[2]: k for k, p in enumerate(props)}
                    verts = np.asarray(
                        [[float(r[cols["x"]]), float(r[cols["y"]]),
                          float(r[cols["z"]])] for r in rows], np.float32)
                elif name == "face":
                    for r in rows:
                        idx = [int(x) for x in r[1:1 + int(r[0])]]
                        for j in range(1, len(idx) - 1):
                            faces.append([idx[0], idx[j], idx[j + 1]])
                continue
            # binary_little_endian
            if name == "vertex" and all(p[0] == "scalar" for p in props):
                dt = np.dtype([(p[2], "<" + p[1]) for p in props])
                arr = np.frombuffer(fh.read(dt.itemsize * count), dt)
                verts = np.stack([arr["x"], arr["y"], arr["z"]],
                                 axis=1).astype(np.float32)
            elif name == "face":
                cnt_t, idx_t = props[0][1]
                cnt_dt = np.dtype("<" + cnt_t)
                idx_dt = np.dtype("<" + idx_t)
                for _ in range(count):
                    (k,) = np.frombuffer(fh.read(cnt_dt.itemsize), cnt_dt)
                    idx = np.frombuffer(fh.read(idx_dt.itemsize * int(k)),
                                        idx_dt)
                    for j in range(1, len(idx) - 1):
                        faces.append([int(idx[0]), int(idx[j]),
                                      int(idx[j + 1])])
            elif all(p[0] == "scalar" for p in props):
                # unknown fixed-size element: skip in one read
                width = sum(np.dtype("<" + p[1]).itemsize for p in props)
                fh.read(width * count)
            else:
                # element with list properties: width is data-dependent, so
                # walk row by row honoring each list count (a scalar-only
                # skip would desync the stream for every later element);
                # vertex elements still yield x/y/z from their scalars
                rows = []
                for _ in range(count):
                    vals = {}
                    for p in props:
                        if p[0] == "scalar":
                            dt = np.dtype("<" + p[1])
                            (v,) = np.frombuffer(fh.read(dt.itemsize), dt)
                            vals[p[2]] = v
                        else:
                            cnt_t, item_t = p[1]
                            cnt_dt = np.dtype("<" + cnt_t)
                            (k,) = np.frombuffer(fh.read(cnt_dt.itemsize),
                                                 cnt_dt)
                            fh.read(np.dtype("<" + item_t).itemsize * int(k))
                    rows.append(vals)
                if name == "vertex":
                    verts = np.asarray([[r["x"], r["y"], r["z"]]
                                        for r in rows], np.float32)
        if verts is None or not faces:
            raise ValueError(f"PLY missing vertex/face data: {path}")
        return verts, np.asarray(faces, np.int32)


def save_ply(path: str, mesh: Mesh, binary: bool = True) -> None:
    """PLY writer (fixture/export helper)."""
    verts, faces = mesh
    head = ("ply\nformat %s 1.0\nelement vertex %d\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face %d\nproperty list uchar int vertex_indices\n"
            "end_header\n" % (
                "binary_little_endian" if binary else "ascii",
                len(verts), len(faces)))
    with open(path, "wb") as fh:
        fh.write(head.encode("ascii"))
        if binary:
            fh.write(verts.astype("<f4").tobytes())
            for f in faces:
                fh.write(struct.pack("<B3i", 3, *[int(x) for x in f]))
        else:
            for v in verts:
                fh.write(f"{v[0]} {v[1]} {v[2]}\n".encode("ascii"))
            for f in faces:
                fh.write(f"3 {f[0]} {f[1]} {f[2]}\n".encode("ascii"))


# -----------------------------------------------------------------------------
# glTF 2.0 (.gltf JSON + external/base64 buffers, .glb binary container)
# -----------------------------------------------------------------------------

_GLTF_CTYPE = {5120: "i1", 5121: "u1", 5122: "i2", 5123: "u2",
               5125: "u4", 5126: "f4"}
_GLTF_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _gltf_node_matrix(node) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "scale" in node:
        m[:3, :3] *= np.asarray(node["scale"], np.float64)
    if "rotation" in node:  # xyzw quaternion
        x, y, z, w = node["rotation"]
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        m = np.block([[r @ m[:3, :3], np.zeros((3, 1))],
                      [np.zeros((1, 3)), np.ones((1, 1))]])
    if "translation" in node:
        m[:3, 3] = node["translation"]
    return m


def load_gltf(path: str) -> Mesh:
    """glTF 2.0 reader: TRIANGLES primitives, POSITION + indices, node
    hierarchy transforms baked into world-space vertices.  Supports .glb
    containers, external .bin buffers, and data: URIs."""
    with open(path, "rb") as fh:
        blob = fh.read()
    bin_chunk = None
    if blob[:4] == b"glTF":  # GLB container
        if len(blob) < 12:
            raise ValueError(f"truncated GLB: {path}")
        off = 12
        gltf = None
        while off + 8 <= len(blob):
            (clen, ctype) = struct.unpack_from("<II", blob, off)
            data = blob[off + 8:off + 8 + clen]
            if ctype == 0x4E4F534A:  # JSON
                gltf = json.loads(data.decode("utf-8"))
            elif ctype == 0x004E4942:  # BIN
                bin_chunk = data
            off += 8 + clen + (-clen % 4 if ctype == 0x4E4F534A else 0)
        if gltf is None:
            raise ValueError(f"GLB without JSON chunk: {path}")
    else:
        gltf = json.loads(blob.decode("utf-8"))

    buffers = []
    for buf in gltf.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            buffers.append(bin_chunk)
        elif uri.startswith("data:"):
            buffers.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(os.path.dirname(path), uri), "rb") as fh:
                buffers.append(fh.read())

    def read_accessor(idx):
        acc = gltf["accessors"][idx]
        view = gltf["bufferViews"][acc["bufferView"]]
        dt = np.dtype("<" + _GLTF_CTYPE[acc["componentType"]])
        ncomp = _GLTF_NCOMP[acc["type"]]
        start = (view.get("byteOffset", 0) + acc.get("byteOffset", 0))
        buf = buffers[view["buffer"]]
        stride = view.get("byteStride") or dt.itemsize * ncomp
        count = acc["count"]
        if stride == dt.itemsize * ncomp:
            a = np.frombuffer(buf, dt, count * ncomp, start)
            return a.reshape(count, ncomp)
        rows = np.frombuffer(buf, np.uint8, stride * count, start)
        rows = rows.reshape(count, stride)[:, :dt.itemsize * ncomp]
        return rows.copy().view(dt).reshape(count, ncomp)

    all_v, all_f = [], []

    def walk(node_idx, parent_m):
        node = gltf["nodes"][node_idx]
        m = parent_m @ _gltf_node_matrix(node)
        if "mesh" in node:
            mesh = gltf["meshes"][node["mesh"]]
            for prim in mesh.get("primitives", []):
                if prim.get("mode", 4) != 4:  # TRIANGLES only
                    continue
                pos = read_accessor(prim["attributes"]["POSITION"])
                pos = pos.astype(np.float64)
                w = pos @ m[:3, :3].T + m[:3, 3]
                if "indices" in prim:
                    idx = read_accessor(prim["indices"]).reshape(-1)
                else:
                    idx = np.arange(len(pos))
                base = sum(len(v) for v in all_v)
                all_v.append(w.astype(np.float32))
                all_f.append((idx.reshape(-1, 3) + base).astype(np.int32))
        for child in node.get("children", []):
            walk(child, m)

    scene_idx = gltf.get("scene", 0)
    scenes = gltf.get("scenes", [])
    roots = (scenes[scene_idx]["nodes"] if scenes
             else list(range(len(gltf.get("nodes", [])))))
    for r in roots:
        walk(r, np.eye(4))
    if not all_v or not all_f:
        raise ValueError(f"glTF contains no triangle geometry: {path}")
    return np.concatenate(all_v), np.concatenate(all_f)


def save_glb(path: str, mesh: Mesh) -> None:
    """Minimal GLB writer (fixture/export helper): one indexed
    TRIANGLES primitive."""
    verts, faces = mesh
    vbytes = verts.astype("<f4").tobytes()
    ibytes = faces.astype("<u4").reshape(-1).tobytes()
    binv = vbytes + ibytes
    binv += b"\0" * (-len(binv) % 4)
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "mode": 4}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(verts),
             "type": "VEC3",
             "min": [float(x) for x in verts.min(axis=0)],
             "max": [float(x) for x in verts.max(axis=0)]},
            {"bufferView": 1, "componentType": 5125,
             "count": faces.size, "type": "SCALAR"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(vbytes)},
            {"buffer": 0, "byteOffset": len(vbytes),
             "byteLength": len(ibytes)}],
        "buffers": [{"byteLength": len(binv)}],
    }
    js = json.dumps(gltf).encode("utf-8")
    js += b" " * (-len(js) % 4)
    total = 12 + 8 + len(js) + 8 + len(binv)
    with open(path, "wb") as fh:
        fh.write(struct.pack("<4sII", b"glTF", 2, total))
        fh.write(struct.pack("<II", len(js), 0x4E4F534A))
        fh.write(js)
        fh.write(struct.pack("<II", len(binv), 0x004E4942))
        fh.write(binv)
