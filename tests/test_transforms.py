"""Image transforms (xvr_tpu/utils/transforms.py), X-ray preprocessing
variants (xvr_tpu/io/xray.py), viz2d plotting, and profiling hooks.

Reference semantics: /root/reference/src/xvr/utils/preprocess.py:5-66
(Standardize -> Equalize -> Resize -> Normalize) and
/root/reference/src/xvr/io/xray.py:92-130 (_preprocess_xray).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.io.xray import _preprocess_xray
from xvr_tpu.utils.transforms import equalize, resize, standardize


def test_standardize_range_and_invariance():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(3.0, 7.0, (2, 1, 16, 16)).astype(np.float32))
    s = standardize(x)
    assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0 + 1e-5
    # affine-invariant per item
    s2 = standardize(x * 5.0 - 11.0)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-4)


def test_equalize_flattens_histogram_and_is_monotone():
    rng = np.random.default_rng(1)
    # heavily skewed intensities
    x = jnp.asarray((rng.beta(0.5, 5.0, (1, 1, 32, 32)) ** 2).astype(np.float32))
    y = np.asarray(equalize(standardize(x)))
    assert y.shape == x.shape
    assert y.min() >= -1e-3 and y.max() <= 1.0 + 1e-3
    # equalized histogram is flatter: std of bin counts shrinks
    hx, _ = np.histogram(np.asarray(standardize(x)).ravel(), bins=16, range=(0, 1))
    hy, _ = np.histogram(y.ravel(), bins=16, range=(0, 1))
    assert hy.std() < hx.std()
    # monotone: pixel ordering preserved (up to soft-kernel tolerance)
    xs = np.asarray(standardize(x)).ravel()
    order = np.argsort(xs)
    diffs = np.diff(y.ravel()[order])
    assert (diffs > -0.02).all()


def test_equalize_is_differentiable():
    x = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 1, 8, 8)).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(equalize(v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_resize_shapes():
    x = jnp.ones((2, 1, 17, 23))
    assert resize(x, 8, 8).shape == (2, 1, 8, 8)


def test_preprocess_xray_background_subtraction():
    # bright background (unattenuated beam) with darker structures: the mode
    # maps to 1.0 after the clip(-1,0)+1 and attenuating structures stay below
    img = np.full((1, 1, 16, 16), 0.75, np.float32)
    img[..., 5:9, 5:9] = [[0.1], [0.3], [0.5], [0.9]]
    out = _preprocess_xray(img * 100.0, 0, True, False, "max")
    vals, counts = np.unique(out.reshape(-1), return_counts=True)
    assert vals[np.argmax(counts)] == pytest.approx(1.0)
    assert out.min() < 0.9
    assert out.min() >= 0.0


def test_preprocess_xray_linearize_inverts_intensity():
    img = np.linspace(0.0, 1.0, 64, dtype=np.float32).reshape(1, 1, 8, 8)
    out = _preprocess_xray(img, 0, False, True, "max")
    # log-linearization: brightest pixel -> 0 line integral, monotone decreasing
    assert out.reshape(-1)[-1] == pytest.approx(0.0, abs=1e-6)
    assert (np.diff(out.reshape(-1)) <= 1e-7).all()


def test_preprocess_xray_multiframe_reducefns():
    frames = np.stack(
        [np.full((4, 4), v, np.float32) for v in (0.1, 0.9, 0.4)]
    )[None, None]  # (1, 1, T, H, W)
    mx = _preprocess_xray(frames.copy(), 0, False, False, "max")
    sm = _preprocess_xray(frames.copy(), 0, False, False, "sum")
    ix = _preprocess_xray(frames.copy(), 0, False, False, 2)
    # CLI-origin frame indices arrive as strings
    ixs = _preprocess_xray(frames.copy(), 0, False, False, "2")
    np.testing.assert_array_equal(ix, ixs)
    assert mx.shape == sm.shape == ix.shape == (1, 1, 4, 4)
    assert mx.max() == pytest.approx(1.0, abs=1e-4)
    # frame index 2 had the middle intensity
    assert 0.0 < ix.mean() < 1.0
    with pytest.raises(ValueError, match="reducefn"):
        _preprocess_xray(frames.copy(), 0, False, False, "bogus")


def test_plot_drr_and_registration(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")

    from xvr_tpu.geometry import convert
    from xvr_tpu.render import Projector, make_test_volume
    from xvr_tpu.visualization.viz2d import plot_drr, plot_registration

    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 1, 8, 8)))
    axs = plot_drr(imgs, title="t")
    assert len(np.ravel(axs)) == 2

    vol = make_test_volume(16, spacing=8.0, kind="sphere")
    proj = Projector.from_volume(vol, sdd=400.0, height=16, delx=8.0, n_samples=32)
    pose = convert(
        jnp.array([[180.0, 0.0, 0.0]]), jnp.array([[0.0, 250.0, 0.0]]),
        parameterization="euler_angles", convention="ZXY", degrees=True,
    )
    fids = jnp.asarray([[[0.0, 0.0, 0.0], [10.0, 5.0, -5.0]]])
    out = tmp_path / "reg.png"
    plot_registration(proj, fids, pose, pose, save_path=out)
    assert out.exists() and out.stat().st_size > 0


@pytest.mark.slow
def test_profiling_annotate_and_trace(tmp_path):
    from xvr_tpu.utils.profiling import annotate, maybe_trace_dir, trace

    with annotate("unit-test-phase"):
        _ = jnp.ones((4,)) + 1
    with trace(tmp_path):
        _ = (jnp.ones((8,)) * 2).block_until_ready()
    assert any(tmp_path.rglob("*")), "profiler trace wrote nothing"
    assert maybe_trace_dir() is None or isinstance(maybe_trace_dir(), str)


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX at the env-chosen dir, honors the
    opt-out, and a jitted call writes at least one cache entry."""
    from xvr_tpu.utils.cache import enable_compilation_cache

    monkeypatch.setenv("XVR_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache() is None

    monkeypatch.delenv("XVR_NO_COMPILE_CACHE")
    cachedir = tmp_path / "jaxcache"
    monkeypatch.setenv("XVR_COMPILE_CACHE", str(cachedir))
    # JAX initializes the persistent cache once per process: an earlier test's
    # compile (with no cache dir) pins it closed, so force re-initialization
    from jax._src import compilation_cache as _cc

    _cc.reset_cache()
    got = enable_compilation_cache()
    assert got == cachedir and cachedir.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(cachedir)
    # drop the persist threshold so even this trivial executable is written
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        # a nonce baked into the HLO forces a FRESH compile: an identical
        # program compiled earlier in this process would be served from the
        # in-memory cache and never touch the disk cache
        nonce = float(np.random.default_rng().integers(3, 1_000_000))
        jax.jit(lambda x: x * nonce + jnp.arange(16.0))(jnp.ones(16)).block_until_ready()
        assert any(cachedir.iterdir()), "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
