"""PNG codec roundtrip, cubemap cross slicing + sampling math."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from opengl_raytracing_tpu.utils.image import (write_png, read_png,
                                               slice_cubemap_cross)
from opengl_raytracing_tpu.ops.cubemap import (direction_to_face_uv,
                                               sample_cubemap, dummy_cubemap)


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (33, 47, 3), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.png")
        write_png(p, img)
        back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_float_input():
    img = np.linspace(0, 1, 16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.png")
        write_png(p, img)
        back = read_png(p).astype(np.float32) / 255.0
    np.testing.assert_allclose(back, img, atol=1.0 / 255.0)


def test_cross_slicing_layout():
    f = 4
    img = np.zeros((3 * f, 4 * f, 3), np.uint8)
    # paint each tile with a unique value per the reference layout
    # +X(2,1) -X(0,1) +Y(1,0) -Y(1,2) +Z(1,1) -Z(3,1)
    tiles = {(2, 1): 10, (0, 1): 20, (1, 0): 30, (1, 2): 40, (1, 1): 50,
             (3, 1): 60}
    for (cx, cy), val in tiles.items():
        img[cy * f:(cy + 1) * f, cx * f:(cx + 1) * f] = val
    faces = slice_cubemap_cross(img)
    expect = [10, 20, 30, 40, 50, 60]
    for i, e in enumerate(expect):
        np.testing.assert_allclose(faces[i], e / 255.0, atol=1e-6)


def test_face_selection_axes():
    dirs = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)
    face, s, t = direction_to_face_uv(dirs)
    np.testing.assert_array_equal(np.asarray(face), [0, 1, 2, 3, 4, 5])
    # axis-aligned directions land at face centers
    np.testing.assert_allclose(np.asarray(s), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.5, atol=1e-6)


def test_sample_cubemap_face_colors():
    env = np.zeros((6, 8, 8, 3), np.float32)
    for i in range(6):
        env[i, :, :, 0] = (i + 1) / 6.0
    env = jnp.asarray(env)
    dirs = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)
    c = np.asarray(sample_cubemap(env, dirs))
    np.testing.assert_allclose(c[:, 0], (np.arange(6) + 1) / 6.0, atol=1e-6)


def test_sample_cubemap_bilinear_continuity():
    rng = np.random.RandomState(1)
    env = jnp.asarray(rng.rand(6, 16, 16, 3).astype(np.float32))
    d1 = jnp.asarray([0.8, 0.1, 0.59])
    d2 = jnp.asarray([0.8, 0.1, 0.61])
    c1 = np.asarray(sample_cubemap(env, d1 / jnp.linalg.norm(d1)))
    c2 = np.asarray(sample_cubemap(env, d2 / jnp.linalg.norm(d2)))
    assert np.abs(c1 - c2).max() < 0.5  # no wild discontinuity


def test_dummy_cubemap_color():
    env = dummy_cubemap()
    c = np.asarray(sample_cubemap(env, jnp.asarray([0.0, 1.0, 0.0])))
    np.testing.assert_allclose(c, [128 / 255, 128 / 255, 1.0], atol=1e-6)


def test_sample_cubemap_gather_modes_bit_match(monkeypatch):
    """The flat / onetake / planes / multi gather lowerings fetch
    identical taps with identical per-channel arithmetic ->
    bit-identical rgb."""
    rng = np.random.RandomState(7)
    env = jnp.asarray(rng.rand(6, 9, 9, 3).astype(np.float32))
    d = rng.randn(257, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    out = {}
    for mode in ("flat", "onetake", "patch", "planes", "multi"):
        monkeypatch.setenv("ORT_ENV_GATHER", mode)
        out[mode] = np.asarray(sample_cubemap(env, d))
    np.testing.assert_array_equal(out["flat"], out["multi"])
    np.testing.assert_array_equal(out["onetake"], out["multi"])
    np.testing.assert_array_equal(out["patch"], out["multi"])
    np.testing.assert_array_equal(out["planes"], out["multi"])


def test_sample_cubemap_u8_mode_exact_for_png_tables(monkeypatch):
    """'u8' gathers a uint8 table and divides after the fetch —
    bit-identical to 'flat' whenever the environment is k/255-valued
    (every PNG-sourced cross, the loader's exact arithmetic)."""
    rng = np.random.RandomState(11)
    env = jnp.asarray(
        rng.randint(0, 256, (6, 9, 9, 3)).astype(np.float32) / 255.0)
    d = rng.randn(513, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    monkeypatch.setenv("ORT_ENV_GATHER", "flat")
    want = np.asarray(sample_cubemap(env, d))
    monkeypatch.setenv("ORT_ENV_GATHER", "u8")
    got = np.asarray(sample_cubemap(env, d))
    np.testing.assert_array_equal(got, want)
    monkeypatch.setenv("ORT_ENV_GATHER", "patch_u8")
    got_p = np.asarray(sample_cubemap(env, d))
    np.testing.assert_array_equal(got_p, want)


def test_sample_cubemap_auto_mode_and_u8_arrays(monkeypatch):
    """'auto' (the default) resolves by array dtype: uint8 tables take
    the patch_u8 lowering with no re-quantization, float tables take
    'patch' — both bit-identical to 'flat' on the float values.  Every
    legacy explicit mode also accepts a uint8 array (floated k/255)."""
    rng = np.random.RandomState(5)
    ints = rng.randint(0, 256, (6, 9, 9, 3))
    env_f = jnp.asarray(ints.astype(np.float32) / 255.0)
    env_u8 = jnp.asarray(ints.astype(np.uint8))
    d = rng.randn(513, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    monkeypatch.setenv("ORT_ENV_GATHER", "flat")
    want = np.asarray(sample_cubemap(env_f, d))
    monkeypatch.delenv("ORT_ENV_GATHER", raising=False)  # auto default
    np.testing.assert_array_equal(np.asarray(sample_cubemap(env_u8, d)),
                                  want)
    np.testing.assert_array_equal(np.asarray(sample_cubemap(env_f, d)),
                                  want)
    for mode in ("flat", "onetake", "u8", "patch", "planes", "multi"):
        monkeypatch.setenv("ORT_ENV_GATHER", mode)
        np.testing.assert_array_equal(
            np.asarray(sample_cubemap(env_u8, d)), want,
            err_msg=f"u8 array under mode {mode}")
