"""Metric math tests: SSIM/PSNR closed cases, Fréchet distance against the
analytic Gaussian formula, KID basic properties."""

from pathlib import Path

import numpy as np
import pytest

from video_diffusion_tpu.eval.metrics import frechet_distance, kid, psnr, ssim


def test_ssim_identity():
    img = np.random.RandomState(0).rand(32, 32)
    assert ssim(img, img) == pytest.approx(1.0)


def test_ssim_decreases_with_noise():
    rs = np.random.RandomState(1)
    img = rs.rand(64, 64)
    s1 = ssim(img, np.clip(img + 0.05 * rs.randn(64, 64), 0, 1))
    s2 = ssim(img, np.clip(img + 0.3 * rs.randn(64, 64), 0, 1))
    assert 1 > s1 > s2 > 0


def test_ssim_matches_constant_shift_formula():
    """For x vs x+c (constant), variance terms are equal; SSIM reduces to the
    luminance term (2 ux uy + C1)/(ux^2 + uy^2 + C1)."""
    img = np.full((32, 32), 0.5)
    c = 0.2
    C1 = 0.01**2
    expected = (2 * 0.5 * 0.7 + C1) / (0.5**2 + 0.7**2 + C1)
    assert ssim(img, img + c) == pytest.approx(expected, rel=1e-6)


def test_psnr_closed_form():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 0.1)
    assert psnr(a, b) == pytest.approx(10 * np.log10(1 / 0.01))
    assert psnr(a, b, data_range=2) == pytest.approx(10 * np.log10(4 / 0.01))


def test_frechet_distance_analytic():
    """FD between two sample sets drawn from known Gaussians approaches
    |mu1-mu2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2))."""
    rs = np.random.RandomState(2)
    n, d = 20000, 4
    f1 = rs.randn(n, d)
    f2 = rs.randn(n, d) * 2.0 + 1.0
    # analytic: mu diff = 1 each dim -> d; covs I and 4I -> tr(I + 4I - 2*2I)=d
    expected = d * 1.0 + d * (1 + 4 - 2 * 2)
    got = frechet_distance(f1, f2)
    assert got == pytest.approx(expected, rel=0.05)
    assert frechet_distance(f1, f1) == pytest.approx(0.0, abs=1e-6)


def test_kid_properties():
    rs = np.random.RandomState(3)
    f1 = rs.randn(500, 8)
    f2 = rs.randn(500, 8)
    f3 = rs.randn(500, 8) + 2.0
    same = kid(f1, f2)
    diff = kid(f1, f3)
    assert abs(same) < 0.5
    assert diff > same + 1.0


def test_lpips_embedder_distance_consistency():
    """The embedder's squared L2 distance must equal the LPIPS distance
    (inference_util.py:15-31 contract)."""
    from video_diffusion_tpu.eval.lpips import LPIPS, LpipsEmbedder

    rs = np.random.RandomState(4)
    x = rs.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rs.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    lp = LPIPS()
    emb = LpipsEmbedder()
    d_direct = lp(x, y)
    ex, ey = emb(x), emb(y)
    d_emb = ((ex - ey) ** 2).sum(axis=1)
    np.testing.assert_allclose(d_emb, d_direct, rtol=1e-3)


def test_i3d_shapes_and_fvd_pipeline():
    from video_diffusion_tpu.eval.i3d import FVDFeatureExtractor

    fx = FVDFeatureExtractor(batch_size=2)
    rs = np.random.RandomState(5)
    vids1 = rs.randint(0, 255, (4, 9, 64, 64, 3), dtype=np.uint8)
    vids2 = rs.randint(0, 255, (4, 9, 64, 64, 3), dtype=np.uint8)
    f1 = fx.extract_features(vids1)
    f2 = fx.extract_features(vids2)
    assert f1.shape == (4, 400)
    assert np.isfinite(f1).all()
    fvd_val = fx.compute_fvd(f1, f2)
    assert np.isfinite(fvd_val)
    # identical sets -> 0
    assert fx.compute_fvd(f1, f1) == pytest.approx(0.0, abs=1e-4)


def test_frechet_degenerate_guard():
    """16 videos x 400-dim features must be flagged degenerate and warn
    (VERDICT r2: the function used to return plausible-looking ~0s)."""
    import warnings

    from video_diffusion_tpu.eval.metrics import (
        frechet_degenerate,
        frechet_distance,
    )

    rng = np.random.default_rng(0)
    a = rng.normal(size=(16, 400))
    b = rng.normal(loc=5.0, size=(16, 400))
    assert frechet_degenerate(a, b)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        frechet_distance(a, b)
    assert any("degenerate" in str(x.message) for x in w)

    ok1 = rng.normal(size=(50, 8))
    ok2 = rng.normal(size=(60, 8))
    assert not frechet_degenerate(ok1, ok2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        frechet_distance(ok1, ok2)
    assert not any("degenerate" in str(x.message) for x in w)


def test_video_eval_fvd_mode_also_reports_kid(tmp_path):
    """scripts/video_eval.py's fvd mode must emit a 'kid' key from the same
    feature pass — KID is the unbiased distributional metric of record when
    the 400-d Frechet estimate is rank-deficient (N <= 400 videos)."""
    import sys
    from collections import OrderedDict

    sys.path.insert(0, str((Path(__file__).parent.parent / "scripts")))
    from video_eval import compute_fvd_lazy

    class FakeFetch:
        obs_length = 1

        def __len__(self):
            return 3

        def __getitem__(self, i):
            rs = np.random.RandomState(i)
            gt = rs.rand(9 + self.obs_length, 3, 32, 32).astype(np.float32)
            preds = OrderedDict(
                (f"sample_{i:04d}-{k}",
                 rs.rand(9 + self.obs_length, 3, 32, 32).astype(np.float32))
                for k in range(2)
            )
            return {"gt": gt[self.obs_length:],
                    "preds": OrderedDict(
                        (k, v[self.obs_length:]) for k, v in preds.items())}

    out = compute_fvd_lazy(FakeFetch(), T=10, num_samples=2, batch_size=2)
    assert out["fvd"].shape == (1, 2, 1)
    assert out["kid"].shape == (1, 2, 1)
    assert np.isfinite(out["kid"]).all()
    # 3 videos x 400-d features: Frechet must be stamped degenerate, KID not
    assert out.get("_provenance/fvd_degenerate") is True
