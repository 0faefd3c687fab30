"""JPEG + Radiance HDR decoders vs third-party oracles.

Production decoding is self-contained (utils/image.py plays the vendored
stb_image role, reference: src/render/stb_image_impl.cpp); PIL/cv2 are
used here ONLY as encoders/reference decoders for fixtures.
"""

import numpy as np
import pytest

from opengl_raytracing_tpu.utils.image import (read_jpeg, read_hdr,
                                               write_hdr, read_image,
                                               slice_cubemap_cross,
                                               encode_png)

PIL = pytest.importorskip("PIL.Image")
cv2 = pytest.importorskip("cv2")


def _pattern(h, w):
    """Smooth-ish RGB test card (JPEG-friendly)."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 127 + 120 * np.sin(x / 17.0)
    g = 127 + 120 * np.cos(y / 23.0)
    b = 127 + 120 * np.sin((x + y) / 31.0)
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsampling,size", [(0, (64, 48)),   # 4:4:4
                                              (1, (80, 56)),   # 4:2:2
                                              (2, (120, 90))])  # 4:2:0
def test_jpeg_decode_matches_pil(tmp_path, subsampling, size):
    w, h = size
    img = _pattern(h, w)
    path = str(tmp_path / "t.jpg")
    PIL.fromarray(img).save(path, quality=92, subsampling=subsampling)
    ours = read_jpeg(path)
    ref = np.asarray(PIL.open(path).convert("RGB"))
    assert ours.shape == ref.shape == (h, w, 3)
    # decoders may differ by a hair in IDCT rounding
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.0
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 4


def test_jpeg_grayscale_and_odd_size(tmp_path):
    img = _pattern(37, 53)[..., 0]
    path = str(tmp_path / "g.jpg")
    PIL.fromarray(img, mode="L").save(path, quality=90)
    ours = read_jpeg(path)
    ref = np.asarray(PIL.open(path).convert("RGB"))
    assert ours.shape == (37, 53, 3)
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 4


def test_jpeg_restart_markers(tmp_path):
    img = _pattern(96, 128)
    path = str(tmp_path / "r.jpg")
    ok = cv2.imwrite(path, img[..., ::-1],
                     [cv2.IMWRITE_JPEG_QUALITY, 90,
                      cv2.IMWRITE_JPEG_RST_INTERVAL, 4])
    assert ok
    with open(path, "rb") as fh:
        assert b"\xff\xdd" in fh.read()  # DRI present
    ours = read_jpeg(path)
    ref = np.asarray(PIL.open(path).convert("RGB"))
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 4


@pytest.mark.parametrize("subsampling,size", [(0, (64, 48)),   # 4:4:4
                                              (1, (80, 56)),   # 4:2:2
                                              (2, (121, 93))])  # 4:2:0 odd
def test_jpeg_progressive_matches_pil(tmp_path, subsampling, size):
    """SOF2 spectral-selection/successive-approximation scans
    (stb parity: include/stb_image.h stbi__jpeg progressive paths)."""
    w, h = size
    img = _pattern(h, w)
    path = str(tmp_path / "p.jpg")
    PIL.fromarray(img).save(path, quality=92, progressive=True,
                            subsampling=subsampling)
    with open(path, "rb") as fh:
        assert b"\xff\xc2" in fh.read()  # really SOF2
    ours = read_jpeg(path)
    ref = np.asarray(PIL.open(path).convert("RGB"))
    assert ours.shape == ref.shape == (h, w, 3)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.0
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 4


def test_jpeg_progressive_same_as_sequential(tmp_path):
    """The progressive and sequential decoders reconstruct the same
    coefficients, so identical quant tables must give near-identical
    pixels (only scan structure differs)."""
    img = _pattern(90, 120)
    seq, prog = str(tmp_path / "s.jpg"), str(tmp_path / "p.jpg")
    PIL.fromarray(img).save(seq, quality=85, progressive=False,
                            subsampling=2)
    PIL.fromarray(img).save(prog, quality=85, progressive=True,
                            subsampling=2)
    a, b = read_jpeg(seq), read_jpeg(prog)
    # Pillow's progressive scan script keeps the same quantized
    # coefficients; allow a hair for optimized-huffman rounding
    assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_jpeg_progressive_restart_markers(tmp_path):
    img = _pattern(96, 128)
    path = str(tmp_path / "pr.jpg")
    ok = cv2.imwrite(path, img[..., ::-1],
                     [cv2.IMWRITE_JPEG_QUALITY, 90,
                      cv2.IMWRITE_JPEG_PROGRESSIVE, 1,
                      cv2.IMWRITE_JPEG_RST_INTERVAL, 4])
    assert ok
    with open(path, "rb") as fh:
        blob = fh.read()
    assert b"\xff\xc2" in blob and b"\xff\xdd" in blob
    ours = read_jpeg(path)
    ref = np.asarray(PIL.open(path).convert("RGB"))
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 4


def test_progressive_cross_through_env_pipeline(tmp_path):
    """A progressive-JPEG 4x3 cubemap cross loads through the same env
    pipeline the picker uses (reference picker surface: gui.cpp:806-838;
    stb decodes progressive transparently)."""
    from opengl_raytracing_tpu.utils.image import load_cubemap_cross
    face = 16
    cross = np.zeros((3 * face, 4 * face, 3), np.uint8)
    for i in range(4):
        cross[face:2 * face, i * face:(i + 1) * face] = 40 * (i + 1)
    cross[0:face, face:2 * face] = [200, 30, 30]
    cross[2 * face:, face:2 * face] = [30, 200, 30]
    path = str(tmp_path / "cross.jpg")
    PIL.fromarray(cross).save(path, quality=95, progressive=True)
    faces = load_cubemap_cross(path)
    assert faces.shape == (6, face, face, 3)
    assert np.isfinite(np.asarray(faces)).all()


def test_jpeg_progressive_grayscale(tmp_path):
    img = _pattern(37, 53)[..., 0]
    path = str(tmp_path / "pg.jpg")
    PIL.fromarray(img, mode="L").save(path, quality=90, progressive=True)
    ours = read_jpeg(path)
    ref = np.asarray(PIL.open(path).convert("RGB"))
    assert ours.shape == (37, 53, 3)
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 4


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_jpeg_encode_roundtrip(tmp_path, subsampling):
    """Our encoder (stb_image_write's stbi_write_jpg counterpart) must
    decode with BOTH our decoder and a third-party one."""
    from opengl_raytracing_tpu.utils.image import encode_jpeg
    import io
    img = _pattern(90, 121)
    blob = encode_jpeg(img, quality=92, subsampling=subsampling)
    ref = np.asarray(PIL.open(io.BytesIO(blob)).convert("RGB"))
    assert ref.shape == img.shape
    assert np.mean(np.abs(ref.astype(int) - img.astype(int))) < 2.0
    path = str(tmp_path / "enc.jpg")
    with open(path, "wb") as fh:
        fh.write(blob)
    ours = read_jpeg(path)
    assert np.mean(np.abs(ours.astype(int) - img.astype(int))) < 2.0


def test_jpeg_encode_native_matches_python():
    """The C++ huffman pass emits byte-identical entropy data to the
    python oracle."""
    from opengl_raytracing_tpu.utils import image as im
    from opengl_raytracing_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(5)
    blocks = (rng.randint(-80, 80, (48, 64)) *
              (rng.rand(48, 64) < 0.2)).astype(np.int32)
    comp_ids = np.tile(np.array([0, 0, 1, 2], np.uint8), 12)
    dc = [im._jenc_codes(im._JH_DC_Y), im._jenc_codes(im._JH_DC_C)]
    ac = [im._jenc_codes(im._JH_AC_Y), im._jenc_codes(im._JH_AC_C)]
    nat = native.jpeg_entropy_encode(
        blocks, comp_ids, np.stack([dc[0][0], dc[1][0]]),
        np.stack([dc[0][1], dc[1][1]]), np.stack([ac[0][0], ac[1][0]]),
        np.stack([ac[0][1], ac[1][1]]))
    py = im._jenc_entropy_python(
        blocks, comp_ids, [dc[0][0], dc[1][0]], [dc[0][1], dc[1][1]],
        [ac[0][0], ac[1][0]], [ac[0][1], ac[1][1]])
    assert nat == py


def test_jpeg_encode_gray_and_float():
    from opengl_raytracing_tpu.utils.image import encode_jpeg
    import io
    img = _pattern(40, 56)
    f = encode_jpeg(img.astype(np.float32) / 255.0, quality=90)
    ref = np.asarray(PIL.open(io.BytesIO(f)).convert("RGB"))
    assert np.mean(np.abs(ref.astype(int) - img.astype(int))) < 2.5
    g = encode_jpeg(img[..., 0], quality=90)  # 2D grayscale input
    ref = np.asarray(PIL.open(io.BytesIO(g)).convert("RGB"))
    assert np.mean(np.abs(ref[..., 0].astype(int)
                          - img[..., 0].astype(int))) < 2.5


def test_hdr_roundtrip_and_cv2_oracle(tmp_path):
    rng = np.random.default_rng(3)
    hdrimg = (rng.random((24, 32, 3)).astype(np.float32) * 4.0) ** 2
    # our flat writer -> our reader
    p1 = str(tmp_path / "a.hdr")
    write_hdr(p1, hdrimg)
    back = read_hdr(p1)
    # RGBE shares one exponent across channels: error bound is relative
    # to the per-pixel MAX channel (1/256 of it after round-to-nearest)
    tol = hdrimg.max(axis=-1, keepdims=True) / 200.0 + 1e-5
    assert np.all(np.abs(back - hdrimg) <= tol)
    # cv2 writer (RLE scanlines) -> our reader
    p2 = str(tmp_path / "b.hdr")
    assert cv2.imwrite(p2, hdrimg[..., ::-1])
    ours = read_hdr(p2)
    ref = cv2.imread(p2, cv2.IMREAD_UNCHANGED)[..., ::-1]
    assert np.allclose(ours, ref, rtol=1e-5, atol=1e-6)
    tol = hdrimg.max(axis=-1, keepdims=True) / 120.0 + 1e-5
    assert np.all(np.abs(ours - hdrimg) <= tol)


def test_read_image_dispatch(tmp_path):
    img = _pattern(12, 16)
    png = tmp_path / "x.png"
    png.write_bytes(encode_png(img))
    assert read_image(str(png)).shape == (12, 16, 3)
    jpg = str(tmp_path / "x.jpg")
    PIL.fromarray(img).save(jpg, quality=95)
    assert read_image(jpg).dtype == np.uint8
    hdr = str(tmp_path / "x.hdr")
    write_hdr(hdr, img.astype(np.float32) / 255.0)
    assert read_image(hdr).dtype == np.float32
    bogus = tmp_path / "x.bin"
    bogus.write_bytes(b"\x00" * 32)
    with pytest.raises(ValueError, match="unrecognized"):
        read_image(str(bogus))


def test_hdr_cubemap_renders_through_pipeline():
    """The shipped .hdr cross loads via the env picker surface and drives
    a full frame (reference env flow: gui.cpp:806-838 -> cubemap.cpp)."""
    from opengl_raytracing_tpu.app import Application, AppState
    from opengl_raytracing_tpu.models.presets import preset

    st = AppState(height=16, width=24, params=preset("baseline"))
    hdrs = [e for e in st.env_picker.entries if e.endswith(".hdr")]
    if not hdrs:
        pytest.skip("no .hdr asset in cubemaps/")
    assert st.load_env_map(hdrs[0])
    assert float(st.env_map.max()) > 1.0  # linear radiance survived
    app = Application(state=st, jit=False)
    img = np.asarray(app.step())
    assert img.shape == (16, 24, 3)
    assert np.isfinite(img).all() and img.max() > 0.05


def test_hdr_cubemap_cross_slices_linear(tmp_path):
    """An .hdr 4x3 cross keeps linear >1 radiance through the slicer."""
    f = 8
    cross = np.zeros((3 * f, 4 * f, 3), np.float32)
    vals = [1.5, 2.5, 3.5, 4.5, 5.5, 6.5]
    layout = ((2, 1), (0, 1), (1, 0), (1, 2), (1, 1), (3, 1))
    for i, (cx, cy) in enumerate(layout):
        cross[cy * f:(cy + 1) * f, cx * f:(cx + 1) * f] = vals[i]
    path = str(tmp_path / "c.hdr")
    write_hdr(path, cross)
    faces = slice_cubemap_cross(read_image(path))
    assert faces.shape == (6, f, f, 3)
    for i, v in enumerate(vals):
        assert np.allclose(faces[i], v, rtol=0.01)


# -----------------------------------------------------------------------------
# OpenEXR
# -----------------------------------------------------------------------------

def _hdr_pattern(h, w, scale=8.0):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([np.abs(np.sin(x / 7.0)) * scale,
                     np.abs(np.cos(y / 5.0)) * scale,
                     (x + y) / (h + w) * scale], -1).astype(np.float32)


@pytest.mark.parametrize("half", [True, False])
@pytest.mark.parametrize("compression", [0, 2, 3])  # NONE, ZIPS, ZIP
def test_exr_roundtrip(tmp_path, half, compression):
    from opengl_raytracing_tpu.utils.image import read_exr, write_exr
    img = _hdr_pattern(33, 20)  # odd height exercises partial ZIP blocks
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=half, compression=compression)
    back = read_exr(p)
    assert back.shape == img.shape and back.dtype == np.float32
    tol = 4e-3 if half else 1e-6
    assert np.abs(back - img).max() <= tol * img.max()


def test_exr_read_image_dispatch_and_unsupported(tmp_path):
    from opengl_raytracing_tpu.utils.image import write_exr
    img = _hdr_pattern(6, 8)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    assert read_image(p).dtype == np.float32
    # multi-part bit set -> clean error
    import struct
    with open(p, "rb") as fh:
        blob = bytearray(fh.read())
    struct.pack_into("<I", blob, 4, struct.unpack_from("<I", blob, 4)[0]
                     | 0x200)
    bad = tmp_path / "multi.exr"
    bad.write_bytes(bytes(blob))
    from opengl_raytracing_tpu.utils.image import read_exr
    with pytest.raises(ValueError, match="multi-part"):
        read_exr(str(bad))


def test_exr_cubemap_cross_through_pipeline(tmp_path):
    """An .exr 4x3 cross loads through AppState.load_env_map and keeps
    linear >1 radiance (full reference env-picker surface,
    gui.cpp:806-838)."""
    from opengl_raytracing_tpu.app.state import AppState
    from opengl_raytracing_tpu.utils.image import write_exr
    f = 8
    cross = np.zeros((3 * f, 4 * f, 3), np.float32)
    layout = ((2, 1), (0, 1), (1, 0), (1, 2), (1, 1), (3, 1))
    vals = [1.5, 2.5, 3.5, 4.5, 5.5, 6.5]
    for i, (cx, cy) in enumerate(layout):
        cross[cy * f:(cy + 1) * f, cx * f:(cx + 1) * f] = vals[i]
    p = str(tmp_path / "sky.exr")
    write_exr(p, cross)
    st = AppState(height=16, width=24)
    assert st.load_env_map(p)
    faces = np.asarray(st.env_map)
    assert faces.shape == (6, f, f, 3)
    for i, v in enumerate(vals):
        assert np.allclose(faces[i], v, rtol=2e-3)


def test_native_jpeg_scan_matches_python_path(tmp_path, monkeypatch):
    """The native entropy decode + batched IDCT must reproduce the
    per-block python loop (including restart markers and subsampling)."""
    import opengl_raytracing_tpu.native as native
    if not native.available():
        pytest.skip("native library unavailable")
    img = _pattern(90, 120)
    path = str(tmp_path / "n.jpg")
    ok = cv2.imwrite(path, img[..., ::-1],
                     [cv2.IMWRITE_JPEG_QUALITY, 88,
                      cv2.IMWRITE_JPEG_RST_INTERVAL, 3])
    assert ok
    ours = read_jpeg(path)
    monkeypatch.setattr(native, "jpeg_entropy_scan", lambda *a, **k: None)
    ref = read_jpeg(path)
    # identical entropy decode; IDCT batching may differ in the last ulp
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 1
    assert (ours != ref).mean() < 0.01


def test_jpeg_fill_bytes_before_marker(tmp_path):
    """JPEG allows any number of 0xFF fill bytes before a marker
    (ITU T.81 B.1.1.2); the segment scanner must skip them."""
    img = _pattern(48, 64)
    path = str(tmp_path / "f.jpg")
    PIL.fromarray(img).save(path, quality=90)
    data = open(path, "rb").read()
    i = data.index(b"\xff\xdb")          # first DQT
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    path2 = str(tmp_path / "f_pad.jpg")
    open(path2, "wb").write(padded)
    assert np.array_equal(read_jpeg(path2), read_jpeg(path))


def test_png_truncated_raises(tmp_path):
    """A PNG whose IHDR dims exceed the IDAT payload must raise a
    catchable ValueError (the native defilter would otherwise read out
    of bounds trusting h*w*c)."""
    from opengl_raytracing_tpu.utils.image import read_png
    img = _pattern(8, 8)
    data = bytearray(encode_png(img))
    # IHDR payload starts at byte 16; height field at 20..24 (no CRC
    # validation in read_png, so patching in place is enough)
    data[20:24] = (64).to_bytes(4, "big")
    p = str(tmp_path / "trunc.png")
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="too short"):
        read_png(p)
