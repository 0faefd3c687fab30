"""Decoder robustness fuzz: corrupted/truncated image files must either
decode or raise a Python exception — never crash or hang.

This matters because the sequential hot paths run in C++
(native/image_native.cpp): an unguarded length would turn a damaged
asset dropped into cubemaps/ into an out-of-bounds read that the
pickers' keep-previous-on-failure logic cannot catch.  Deterministic
corpus (seeded), ~260 mutated inputs across PNG/JPEG/HDR.
"""

import os

import numpy as np
import pytest

from opengl_raytracing_tpu.utils.image import (read_png, read_jpeg,
                                               read_hdr, encode_png,
                                               write_hdr)

PIL = pytest.importorskip("PIL.Image")


def _mutations(data, rng):
    n = len(data)
    for cut in [3, 8, 12, n // 4, n // 2, 3 * n // 4, n - 1]:
        yield data[:cut]
    for _ in range(60):
        b = bytearray(data)
        b[rng.randint(0, n)] = rng.randint(0, 256)
        yield bytes(b)
    for _ in range(20):
        b = bytearray(data)
        for _ in range(8):
            b[rng.randint(0, n)] = rng.randint(0, 256)
        yield bytes(b)


@pytest.mark.parametrize("fmt", ["png", "jpeg", "jpeg_prog", "hdr"])
def test_corrupt_files_never_crash(fmt, tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    if fmt == "png":
        reader, data = read_png, encode_png(img)
    elif fmt == "jpeg":
        p = str(tmp_path / "a.jpg")
        PIL.fromarray(img).save(p, quality=90)
        reader, data = read_jpeg, open(p, "rb").read()
    elif fmt == "jpeg_prog":
        p = str(tmp_path / "a.jpg")
        PIL.fromarray(img).save(p, quality=90, progressive=True)
        reader, data = read_jpeg, open(p, "rb").read()
    else:
        p = str(tmp_path / "a.hdr")
        write_hdr(p, img.astype(np.float32) / 255.0)
        reader, data = read_hdr, open(p, "rb").read()

    path = str(tmp_path / f"m.{fmt}")
    decoded = raised = 0
    for m in _mutations(data, rng):
        with open(path, "wb") as fh:
            fh.write(m)
        try:
            out = reader(path)
            assert isinstance(out, np.ndarray)
            decoded += 1
        except Exception:
            raised += 1  # graceful: catchable by the asset reload path
    assert decoded + raised == 87


def test_exr_negative_attribute_size_raises(tmp_path):
    """A corrupt EXR whose attribute size is negative must raise, not spin
    the header loop forever (regression)."""
    import struct
    import pytest
    from opengl_raytracing_tpu.utils.image import read_exr
    p = tmp_path / "bad.exr"
    buf = struct.pack("<I", 20000630) + struct.pack("<I", 2)
    buf += b"a\0b\0" + struct.pack("<i", -8) + b"\0"
    p.write_bytes(buf)
    with pytest.raises(Exception):
        read_exr(str(p))
