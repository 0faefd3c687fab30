"""Multi-format model import tests (assimp-analog surface,
reference: include/scene/model.h:108-115).

Round-trips procedural meshes through each format's writer/reader and
asserts the gathered world-space triangle soup is identical (vertex
sharing may legally differ between formats — STL flattens)."""

import numpy as np
import pytest

from opengl_raytracing_tpu.scene.geometry import (make_icosphere, save_obj,
                                                  gather_triangles,
                                                  model_transform)
from opengl_raytracing_tpu.scene.importers import (load_model, save_stl,
                                                   save_ply, save_glb,
                                                   save_dae, save_3ds,
                                                   save_fbx,
                                                   MODEL_EXTENSIONS)


def _tri_soup(mesh):
    """Canonical sorted triangle soup for comparison across formats."""
    tris = gather_triangles(mesh, model_transform())
    order = np.lexsort(tris.T[::-1])
    return tris[order]


@pytest.fixture(scope="module")
def ref_mesh():
    return make_icosphere(1.0, 2)


def test_stl_roundtrip(tmp_path, ref_mesh):
    p = str(tmp_path / "m.stl")
    save_stl(p, ref_mesh)
    got = load_model(p)
    assert got[1].shape == (ref_mesh[1].shape[0], 3)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)


def test_stl_ascii(tmp_path, ref_mesh):
    verts, faces = ref_mesh
    tris = verts[faces]
    p = tmp_path / "m_ascii.stl"
    with open(p, "w") as fh:
        fh.write("solid m\n")
        for t in tris:
            fh.write("facet normal 0 0 0\nouter loop\n")
            for v in t:
                fh.write(f"vertex {v[0]} {v[1]} {v[2]}\n")
            fh.write("endloop\nendfacet\n")
        fh.write("endsolid m\n")
    got = load_model(str(p))
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-5)


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, ref_mesh, binary):
    p = str(tmp_path / f"m_{binary}.ply")
    save_ply(p, ref_mesh, binary=binary)
    got = load_model(p)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)


def test_glb_roundtrip(tmp_path, ref_mesh):
    p = str(tmp_path / "m.glb")
    save_glb(p, ref_mesh)
    got = load_model(p)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)


def test_gltf_json_with_data_uri(tmp_path, ref_mesh):
    # .glb -> re-express as .gltf with a base64 data: URI buffer
    import base64
    import json
    import struct
    p = str(tmp_path / "m.glb")
    save_glb(p, ref_mesh)
    with open(p, "rb") as fh:
        blob = fh.read()
    (jlen,) = struct.unpack_from("<I", blob, 12)
    gltf = json.loads(blob[20:20 + jlen].decode("utf-8"))
    boff = 20 + jlen + 8
    binv = blob[boff:boff + gltf["buffers"][0]["byteLength"]]
    gltf["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                 + base64.b64encode(binv).decode("ascii"))
    p2 = str(tmp_path / "m.gltf")
    with open(p2, "w") as fh:
        json.dump(gltf, fh)
    got = load_model(p2)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)


def test_gltf_node_transform(tmp_path, ref_mesh):
    """Node TRS must bake into world-space vertices."""
    import json
    import struct
    p = str(tmp_path / "m.glb")
    save_glb(p, ref_mesh)
    with open(p, "rb") as fh:
        blob = fh.read()
    (jlen,) = struct.unpack_from("<I", blob, 12)
    gltf = json.loads(blob[20:20 + jlen].decode("utf-8"))
    gltf["nodes"][0]["translation"] = [1.0, 2.0, 3.0]
    gltf["nodes"][0]["scale"] = [2.0, 2.0, 2.0]
    js = json.dumps(gltf).encode("utf-8")
    js += b" " * (-len(js) % 4)
    rest = blob[20 + jlen:]
    total = 12 + 8 + len(js) + len(rest)
    p2 = str(tmp_path / "m_t.glb")
    with open(p2, "wb") as fh:
        fh.write(struct.pack("<4sII", b"glTF", 2, total))
        fh.write(struct.pack("<II", len(js), 0x4E4F534A))
        fh.write(js)
        fh.write(rest)
    got = load_model(p2)
    want_v = ref_mesh[0] * 2.0 + np.array([1.0, 2.0, 3.0], np.float32)
    np.testing.assert_allclose(_tri_soup((got[0], got[1])),
                               _tri_soup((want_v, ref_mesh[1])), atol=1e-5)


def test_dae_roundtrip(tmp_path, ref_mesh):
    p = str(tmp_path / "m.dae")
    save_dae(p, ref_mesh)
    got = load_model(p)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-5)


def test_dae_node_transform_and_zup(tmp_path):
    """Node translate/rotate/scale bake in document order (T@R@S);
    Z_UP assets rotate into Y-up like assimp's collada importer.
    Asymmetric fixture: a symmetric mesh makes the sorted-soup compare
    sensitive to lexsort tie order under fp rounding."""
    verts = np.asarray([[1, 2, 3], [4, 5, 6], [7, 8, 10]], np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    p = str(tmp_path / "m.dae")
    save_dae(p, (verts, faces))
    with open(p) as fh:
        doc = fh.read()
    doc = doc.replace("<up_axis>Y_UP</up_axis>", "<up_axis>Z_UP</up_axis>")
    doc = doc.replace(
        '<node id="n0">',
        '<node id="n0"><translate>1 2 3</translate>'
        '<rotate>0 0 1 90</rotate><scale>2 2 2</scale>')
    p2 = str(tmp_path / "m_t.dae")
    with open(p2, "w") as fh:
        fh.write(doc)
    got = load_model(p2)
    # scale 2, rotate 90deg about +z, then translate, then Z_UP->Y_UP
    v = verts.astype(np.float64) * 2.0
    rot = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    v = v @ rot.T + np.asarray([1.0, 2.0, 3.0])
    zup = np.asarray([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
    v = (v @ zup.T).astype(np.float32)
    np.testing.assert_allclose(got[0], v, atol=1e-5)
    np.testing.assert_array_equal(got[1], faces)


def test_dae_polylist(tmp_path):
    """polylist quads fan-triangulate (assimp Triangulate parity)."""
    p = str(tmp_path / "q.dae")
    quad_v = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                        np.float32)
    save_dae(p, (quad_v, np.asarray([[0, 1, 2]], np.int32)))
    with open(p) as fh:
        doc = fh.read()
    doc = doc.replace(
        '<triangles count="1"><input semantic="VERTEX" source="#vtx" '
        'offset="0"/>\n        <p>0 1 2</p></triangles>',
        '<polylist count="1"><input semantic="VERTEX" source="#vtx" '
        'offset="0"/><vcount>4</vcount><p>0 1 2 3</p></polylist>')
    with open(p, "w") as fh:
        fh.write(doc)
    got = load_model(p)
    assert got[1].shape == (2, 3)  # quad -> two triangles
    np.testing.assert_array_equal(got[1], [[0, 1, 2], [0, 2, 3]])


def test_3ds_roundtrip(tmp_path, ref_mesh):
    p = str(tmp_path / "m.3ds")
    save_3ds(p, ref_mesh)
    got = load_model(p)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)


def test_3ds_malformed(tmp_path):
    p = tmp_path / "bad.3ds"
    p.write_bytes(b"\x4d\x4d\x10\x00\x00\x00" + b"\0" * 4)
    with pytest.raises(ValueError):
        load_model(str(p))


def test_fbx_roundtrip(tmp_path, ref_mesh):
    p = str(tmp_path / "m.fbx")
    save_fbx(p, ref_mesh)
    got = load_model(p)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)


def test_fbx_zlib_arrays(tmp_path, ref_mesh):
    """Binary FBX with zlib-compressed (encoding=1) property arrays —
    what real exporters actually write."""
    import struct
    import zlib
    p = str(tmp_path / "m.fbx")
    save_fbx(p, ref_mesh)
    with open(p, "rb") as fh:
        blob = bytearray(fh.read())

    # recompress each uncompressed array property in place (walk the
    # two known array records by their type chars at fixed structure)
    def recompress(blob):
        out = bytearray(blob[:27])
        import opengl_raytracing_tpu.scene.importers as imp
        nodes = []
        imp._fbx_walk_binary(bytes(blob), 27, len(blob), False, nodes)

        def arr_prop(tchar, arr, dtype):
            comp = zlib.compress(np.asarray(arr, dtype).tobytes())
            return (tchar + struct.pack("<III", arr.size, 1, len(comp))
                    + comp)

        def pack(name, props_b, children, base):
            name_b = name.encode("ascii")
            pos = base + 13 + len(name_b) + len(props_b)
            kids = b""
            for cn, cp, cc in children:
                kid = pack(cn, cp, cc, pos)
                kids += kid
                pos += len(kid)
            if children:
                kids += b"\0" * 13
                pos += 13
            nprops = 1 if props_b else 0
            return (struct.pack("<IIIB", pos, nprops, len(props_b),
                                len(name_b)) + name_b + props_b + kids)

        def conv(n):
            name, props, children = n
            pb = b""
            if props and isinstance(props[0], np.ndarray):
                a = props[0]
                pb = arr_prop(b"d" if a.dtype.kind == "f" else b"i", a,
                              "<f8" if a.dtype.kind == "f" else "<i4")
            return (name, pb, [conv(c) for c in children])

        body = b"".join(pack(*conv(n), base=len(out)) for n in nodes[:1])
        return bytes(out) + body + b"\0" * 13

    p2 = str(tmp_path / "mz.fbx")
    with open(p2, "wb") as fh:
        fh.write(recompress(blob))
    got = load_model(p2)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)


def test_fbx_ascii(tmp_path):
    p = str(tmp_path / "a.fbx")
    with open(p, "w") as fh:
        fh.write("""; FBX 7.4.0 project file
Objects:  {
    Geometry: 140234, "Geometry::", "Mesh" {
        Vertices: *15 {
            a: 0,0,0,1,0,0,1,1,0,0,1,0,0,0,2
        }
        PolygonVertexIndex: *7 {
            a: 0,1,-3,0,2,4,-4
        }
    }
}
""")
    got = load_model(p)
    assert got[0].shape == (5, 3)
    np.testing.assert_array_equal(got[1], [[0, 1, 2], [0, 2, 4],
                                           [0, 4, 3]])


def test_fbx_malformed(tmp_path):
    p = tmp_path / "bad.fbx"
    p.write_bytes(b"Kaydara FBX Binary  \x00\x1a\x00" + b"\0" * 8)
    with pytest.raises(ValueError):
        load_model(str(p))


def test_obj_through_dispatcher(tmp_path, ref_mesh):
    p = str(tmp_path / "m.obj")
    save_obj(p, ref_mesh)
    got = load_model(p)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-5)


def test_unsupported_extension(tmp_path):
    p = tmp_path / "m.fbx"
    p.write_bytes(b"whatever")
    with pytest.raises(ValueError):
        load_model(str(p))


def test_appstate_loads_every_format(tmp_path, ref_mesh):
    """AppState.load_bvh_model accepts each importer format and the
    picker surface lists them (reference picker: gui.cpp:721-799)."""
    from opengl_raytracing_tpu.app.state import AppState
    save_stl(str(tmp_path / "a.stl"), ref_mesh)
    save_ply(str(tmp_path / "b.ply"), ref_mesh)
    save_glb(str(tmp_path / "c.glb"), ref_mesh)
    save_obj(str(tmp_path / "d.obj"), ref_mesh)
    save_dae(str(tmp_path / "e.dae"), ref_mesh)
    save_3ds(str(tmp_path / "f.3ds"), ref_mesh)
    save_fbx(str(tmp_path / "g.fbx"), ref_mesh)
    st = AppState(height=24, width=32)
    st.model_picker.directory = str(tmp_path)
    st.model_picker.patterns = tuple("*" + e for e in MODEL_EXTENSIONS)
    entries = st.model_picker.scan()
    assert len(entries) == 7
    for e in entries:
        assert st.load_bvh_model(e), e
        assert st.bvh_tri_count == ref_mesh[1].shape[0]


def test_ply_binary_vertex_with_list_property(tmp_path, ref_mesh):
    """A vertex element carrying a list property must still load: list
    widths are data-dependent, so the loader walks rows instead of the
    scalar fast path (regression: list props used to desync the stream)."""
    verts, faces = ref_mesh
    p = tmp_path / "m_listvert.ply"
    head = ("ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property list uchar float extras\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\n"
            "end_header\n")
    import struct
    with open(p, "wb") as fh:
        fh.write(head.encode("ascii"))
        for v in verts:
            fh.write(struct.pack("<3f", *[float(x) for x in v]))
            fh.write(struct.pack("<B2f", 2, 0.5, 0.25))  # list payload
        for f in faces:
            fh.write(struct.pack("<B3i", 3, *[int(x) for x in f]))
    got = load_model(str(p))
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)


def test_ply_binary_unknown_list_element_before_faces(tmp_path, ref_mesh):
    """An unknown element with a list property placed between vertex and
    face must be skipped row-by-row, keeping the stream aligned."""
    verts, faces = ref_mesh
    p = tmp_path / "m_unknown.ply"
    head = ("ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element edge 3\n"
            "property int flag\nproperty list uchar int verts\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\n"
            "end_header\n")
    import struct
    with open(p, "wb") as fh:
        fh.write(head.encode("ascii"))
        fh.write(verts.astype("<f4").tobytes())
        for k in range(3):  # variable-length edge rows
            fh.write(struct.pack("<iB", k, k + 1))
            fh.write(struct.pack(f"<{k + 1}i", *range(k + 1)))
        for f in faces:
            fh.write(struct.pack("<B3i", 3, *[int(x) for x in f]))
    got = load_model(str(p))
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)


def test_fbx_nonadvancing_record_raises(tmp_path):
    """A corrupt record whose end_offset doesn't advance must raise,
    not spin the walk forever (regression: confirmed hang)."""
    import struct
    p = tmp_path / "loop.fbx"
    head = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", 7400)
    # record at pos 27 with end_off == 27 (nonzero, non-advancing)
    rec = struct.pack("<IIIB", 27, 0, 0, 1) + b"X"
    p.write_bytes(head + rec + b"\0" * 13)
    with pytest.raises(ValueError, match="malformed FBX"):
        load_model(str(p))


def test_3ds_pointcloud_then_mesh(tmp_path, ref_mesh):
    """A faceless (point-cloud) trimesh before a real mesh must not
    mispair the real mesh's faces with the cloud's vertices
    (regression: positional cross-object pairing)."""
    import struct
    verts, faces = ref_mesh
    p = str(tmp_path / "m.3ds")
    save_3ds(p, ref_mesh)
    with open(p, "rb") as fh:
        blob = fh.read()
    # craft a verts-only object and splice it BEFORE the real one
    cloud_v = np.zeros((5, 3), "<f4")
    vch = struct.pack("<HIH", 0x4110, 6 + 2 + cloud_v.size * 4, 5) \
        + cloud_v.tobytes()
    tri = struct.pack("<HI", 0x4100, 6 + len(vch)) + vch
    obj = struct.pack("<HI", 0x4000, 6 + 3 + len(tri)) + b"pc\0" + tri
    # original: MAIN(6) EDITOR(6) OBJECT...; insert after EDITOR header
    ed_body = 12
    new_ed_len = struct.unpack_from("<I", blob, 8)[0] + len(obj)
    new_main_len = struct.unpack_from("<I", blob, 2)[0] + len(obj)
    out = (blob[:2] + struct.pack("<I", new_main_len)
           + blob[6:8] + struct.pack("<I", new_ed_len)
           + obj + blob[ed_body:])
    p2 = str(tmp_path / "m2.3ds")
    with open(p2, "wb") as fh:
        fh.write(out)
    got = load_model(p2)
    # the real mesh's soup must be intact (cloud contributes nothing)
    np.testing.assert_allclose(_tri_soup(got), _tri_soup(ref_mesh),
                               atol=1e-6)
