"""TAA resolve + SVGF filter unit tests against the GLSL semantics
(reference: shaders/rt/rt_taa.glsl:47-180, rt_present.frag:126-225)."""

import numpy as np
import jax.numpy as jnp

from opengl_raytracing_tpu import RenderParams
from opengl_raytracing_tpu.ops.taa import resolve_taa
from opengl_raytracing_tpu.ops.svgf import svgf_filter, present
from opengl_raytracing_tpu.ops.tonemap import aces_tonemap, visualize_motion
from opengl_raytracing_tpu.constants import YCOEFF

H, W = 16, 24
P = RenderParams()


def _rng(seed=0):
    return np.random.RandomState(seed)


def _luma(c):
    return c @ np.asarray(YCOEFF)


def test_taa_disabled_passthrough_with_m2():
    p = P.replace(enable_taa=0)
    curr = jnp.asarray(_rng().rand(H, W, 3), jnp.float32)
    out = np.asarray(resolve_taa(curr, jnp.zeros((H, W, 2)),
                                 jnp.ones((H, W, 4)), jnp.int32(5), p))
    np.testing.assert_allclose(out[..., :3], np.asarray(curr), atol=1e-6)
    np.testing.assert_allclose(out[..., 3], _luma(np.asarray(curr)) ** 2,
                               atol=1e-5)


def test_taa_frame0_ignores_history():
    curr = jnp.asarray(_rng(1).rand(H, W, 3), jnp.float32)
    hist = jnp.full((H, W, 4), 9.0)
    out = np.asarray(resolve_taa(curr, jnp.zeros((H, W, 2)), hist,
                                 jnp.int32(0), P))
    np.testing.assert_allclose(out[..., :3], np.asarray(curr), atol=1e-6)


def test_taa_still_staged_weights():
    curr = jnp.zeros((H, W, 3), jnp.float32)
    hist = jnp.concatenate([jnp.ones((H, W, 3)), jnp.zeros((H, W, 1))], -1)
    for fi, w in ((1, P.taa_history_min_weight),
                  (16, P.taa_history_avg_weight),
                  (64, P.taa_history_max_weight)):
        out = np.asarray(resolve_taa(curr, jnp.zeros((H, W, 2)), hist,
                                     jnp.int32(fi), P))
        np.testing.assert_allclose(out[..., :3], w, atol=1e-6)


def test_taa_moving_oob_discards_history():
    curr = jnp.asarray(_rng(2).rand(H, W, 3), jnp.float32)
    hist = jnp.full((H, W, 4), 5.0)
    # huge motion -> uvPrev out of [0,1] everywhere -> passthrough
    motion = jnp.full((H, W, 2), 4.0)
    out = np.asarray(resolve_taa(curr, motion, hist, jnp.int32(10), P))
    np.testing.assert_allclose(out[..., :3], np.asarray(curr), atol=1e-6)


def test_taa_hard_motion_kills_history():
    curr = jnp.full((H, W, 3), 0.25, jnp.float32)
    hist = jnp.concatenate([jnp.full((H, W, 3), 0.25),
                            jnp.zeros((H, W, 1))], -1)
    # motion above hard threshold but small enough to stay in bounds
    motion = jnp.full((H, W, 2), 0.4)
    out = np.asarray(resolve_taa(curr, motion, hist, jnp.int32(10), P))
    # wHist = 0 -> pure current (where uvPrev still in bounds)
    interior = out[4:-4, 4:-4, :3]
    np.testing.assert_allclose(interior, 0.25, atol=1e-6)


def test_taa_history_box_clamp():
    # still pixel, history far from current -> clamped to +-box before blend
    curr = jnp.zeros((H, W, 3), jnp.float32)
    hist = jnp.concatenate([jnp.full((H, W, 3), 10.0),
                            jnp.zeros((H, W, 1))], -1)
    # moving path with tiny motion > still thresh but < 0.02 -> wHist = maxW
    motion = jnp.full((H, W, 2), 1e-4)
    out = np.asarray(resolve_taa(curr, motion, hist, jnp.int32(50), P))
    # history clamped to box size, blended with max weight... but the
    # relDiff kill: lPrev huge vs lCurr 0 -> colorWeight 0 -> current only
    np.testing.assert_allclose(out[..., :3], 0.0, atol=1e-5)


def test_svgf_smooths_noise_and_keeps_m2_variance_positive():
    rng = _rng(3)
    noisy = 0.5 + 0.1 * rng.randn(H, W, 3)
    l = _luma(noisy)
    m2 = (l ** 2) + 0.02
    accum = jnp.asarray(np.concatenate([noisy, m2[..., None]], -1),
                        jnp.float32)
    gpos = jnp.zeros((H, W, 3))
    gnrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (H, W, 3))
    out = np.asarray(svgf_filter(accum, jnp.zeros((H, W, 2)), gpos, gnrm, P))
    assert out.std() < noisy.std()
    assert abs(out.mean() - noisy.mean()) < 0.02


def test_svgf_respects_normal_edges():
    # two halves with opposite normals; colors differ -> little bleed
    c = np.zeros((H, W, 3), np.float32)
    c[:, :W // 2] = 1.0
    l = _luma(c)
    accum = jnp.asarray(np.concatenate([c, (l**2 + 0.04)[..., None]], -1))
    n = np.zeros((H, W, 3), np.float32)
    n[:, :W // 2, 1] = 1.0
    n[:, W // 2:, 1] = -1.0
    out = np.asarray(svgf_filter(accum, jnp.zeros((H, W, 2)),
                                 jnp.zeros((H, W, 3)), jnp.asarray(n), P))
    edge_bleed = out[:, W // 2 + 1:, :].max()
    assert edge_bleed < 0.25


def test_present_motion_debug():
    accum = jnp.zeros((H, W, 4))
    motion = jnp.zeros((H, W, 2)).at[2, 3].set(jnp.asarray([0.2, 0.0]))
    img = np.asarray(present(accum, motion, jnp.zeros((H, W, 3)),
                             jnp.zeros((H, W, 3)), P, show_motion=True))
    assert img[0, 0].sum() == 0.0       # deadband black
    assert img[2, 3].sum() > 0.0        # moving pixel colored


def test_aces_range_and_monotonic():
    x = jnp.linspace(0.0, 20.0, 100)[:, None] * jnp.ones((1, 3))
    y = np.asarray(aces_tonemap(x, 1.0))
    assert (y >= 0).all() and (y <= 1).all()
    assert (np.diff(y[:, 0]) >= -1e-6).all()
    # exposure scales input
    y2 = np.asarray(aces_tonemap(x, 2.0))
    assert (y2 >= y - 1e-6).all()


def test_visualize_motion_hue_depends_on_direction():
    m = jnp.asarray([[[0.5, 0.0]], [[0.0, 0.5]]])
    img = np.asarray(visualize_motion(m, 1.0))
    assert not np.allclose(img[0, 0], img[1, 0])


def test_taa_planes_gather_matches_row_form(monkeypatch):
    """ORT_TAA_PLANES fetches history as channel-plane scalar gathers;
    the resolve must bit-match the [H*W,4]-row-gather form."""
    rng = np.random.RandomState(3)
    H2, W2 = 24, 32
    curr = jnp.asarray(rng.rand(H2, W2, 3).astype(np.float32))
    hist = jnp.asarray(rng.rand(H2, W2, 4).astype(np.float32))
    motion = jnp.asarray(
        (rng.rand(H2, W2, 2).astype(np.float32) - 0.5) * 0.2)
    monkeypatch.setenv("ORT_TAA_PLANES", "1")
    planes = np.asarray(resolve_taa(curr, motion, hist, jnp.int32(12), P))
    monkeypatch.setenv("ORT_TAA_PLANES", "0")
    rows = np.asarray(resolve_taa(curr, motion, hist, jnp.int32(12), P))
    np.testing.assert_array_equal(planes, rows)


def test_present_half_texel_compat_knob(monkeypatch):
    """ORT_PRESENT_HALF_TEXEL=1 reproduces the reference quirk: every
    pass input is read at texel (x+1, y+1), clamp-at-edge
    (rt_present.frag:232 + accum.cpp NEAREST).  Interior pixels of the
    compat output must equal the default output shifted by one; the
    last row/col must clamp."""
    rng = np.random.RandomState(7)
    accum = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    motion = jnp.zeros((H, W, 2))
    gpos = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    gnrm = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) - 0.5)
    base = np.asarray(present(accum, motion, gpos, gnrm, P))
    monkeypatch.setenv("ORT_PRESENT_HALF_TEXEL", "1")
    comp = np.asarray(present(accum, motion, gpos, gnrm, P))
    # interior: compat[y, x] == base[y+1, x+1] — rigid shift wherever
    # the 7x7 stencil touches neither the validity border (base) nor a
    # clamped row/col (compat): y,x >= 3 and y,x <= dim-5
    assert np.allclose(comp[3:-4, 3:-4], base[4:-3, 4:-3], atol=1e-6)
    assert not np.allclose(comp[3:-4, 3:-4], base[3:-4, 3:-4], atol=1e-6)
