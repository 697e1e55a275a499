"""Quality metrics: SSIM, PSNR (skimage-compatible), Fréchet distance and
polynomial-kernel KID/MMD (reference frechet_video_distance.py:142-327 and
scripts/video_eval.py:205-252).

All pure numpy — no skimage/scipy-TF dependencies; sqrtm via eigen
decomposition of the symmetrized product (equivalent to scipy.linalg.sqrtm
for the PSD matrices occurring here).
"""

import warnings

import numpy as np


def _uniform_filter(img, size):
    """Separable uniform (mean) filter with reflect-ish 'same' handling via
    cumulative sums on an edge-padded array — matches scipy.ndimage
    uniform_filter semantics closely enough for SSIM windows."""
    pad = size // 2
    out = img
    for axis in range(img.ndim):
        padded = np.take(
            out,
            np.clip(np.arange(-pad, out.shape[axis] + pad), 0, out.shape[axis] - 1),
            axis=axis,
        )
        c = np.cumsum(padded, axis=axis, dtype=np.float64)
        zero = np.zeros(
            tuple(1 if a == axis else s for a, s in enumerate(c.shape)),
            dtype=c.dtype,
        )
        c = np.concatenate([zero, c], axis=axis)
        hi = np.take(c, np.arange(size, c.shape[axis]), axis=axis)
        lo = np.take(c, np.arange(0, c.shape[axis] - size), axis=axis)
        out = (hi - lo) / size
    return out


def ssim(im1, im2, data_range=1.0, win_size=7, K1=0.01, K2=0.03):
    """Structural similarity of two 2-D images; defaults match
    skimage.metrics.structural_similarity (uniform 7x7 window,
    gaussian_weights=False) as used per-frame-per-channel by the reference
    (video_eval.py:220-223)."""
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    assert im1.shape == im2.shape and im1.ndim == 2
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    ux = _uniform_filter(im1, win_size)
    uy = _uniform_filter(im2, win_size)
    uxx = _uniform_filter(im1 * im1, win_size)
    uyy = _uniform_filter(im2 * im2, win_size)
    uxy = _uniform_filter(im1 * im2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux**2 + uy**2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean() if pad else S.mean()


def psnr(im1, im2, data_range=1.0):
    """Peak signal-to-noise ratio (skimage.metrics.peak_signal_noise_ratio)."""
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    err = np.mean((im1 - im2) ** 2)
    return 10 * np.log10((data_range**2) / err)


def frechet_degenerate(feats1, feats2):
    """True when either sample count is at or below the feature dimension:
    a covariance estimated from N samples has rank at most N-1, so N == D is
    just as rank-deficient as N < D, and the Fréchet distance collapses
    toward 0 regardless of the data (e.g. 16 videos x 400-dim I3D features —
    see QUALITY.md), so the number carries no signal."""
    feats1, feats2 = np.asarray(feats1), np.asarray(feats2)
    return min(len(feats1), len(feats2)) <= feats1.shape[-1]


def frechet_distance(feats1, feats2):
    """Fréchet distance between Gaussians fit to two feature sets
    (reference frechet_video_distance.py:142-203).

    Warns (and see ``frechet_degenerate``) when the sample count is too
    small for the feature dimension — callers should stamp
    ``_provenance/fvd_degenerate`` instead of publishing a plausible 0.

    :param feats1, feats2: (N, D) feature arrays.
    """
    feats1 = np.asarray(feats1, dtype=np.float64)
    feats2 = np.asarray(feats2, dtype=np.float64)
    if frechet_degenerate(feats1, feats2):
        warnings.warn(
            f"frechet_distance: {min(len(feats1), len(feats2))} samples for "
            f"{feats1.shape[-1]}-dim features — covariance is rank-deficient "
            "and the distance is degenerate (≈0 regardless of data).",
            stacklevel=2,
        )
    mu1, mu2 = feats1.mean(axis=0), feats2.mean(axis=0)
    sigma1 = np.cov(feats1, rowvar=False)
    sigma2 = np.cov(feats2, rowvar=False)
    diff = mu1 - mu2
    # tr(sqrtm(S1 @ S2)) == sum(sqrt(eigvals(S1 @ S2))): S1 @ S2 is similar
    # to the PSD matrix sqrtm(S1) @ S2 @ sqrtm(S1), so its eigenvalues are
    # real and non-negative (up to roundoff, clipped below). eigvals is
    # O(D^3) LAPACK; scipy.sqrtm's Schur recursion takes minutes on this
    # host for rank-deficient 400x400 products.
    eigs = np.linalg.eigvals(sigma1.dot(sigma2))
    tr_covmean = np.sqrt(np.clip(eigs.real, 0.0, None)).sum()
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * tr_covmean)


def _polynomial_kernel(X, Y=None, degree=3, gamma=None, coef0=1.0):
    Y = X if Y is None else Y
    if gamma is None:
        gamma = 1.0 / X.shape[1]
    return (gamma * X.dot(Y.T) + coef0) ** degree


def kid(feats1, feats2, degree=3, gamma=None, coef0=1.0):
    """Kernel Inception/video distance: unbiased polynomial-kernel MMD²
    (reference frechet_video_distance.py:215-327)."""
    X = np.asarray(feats1, dtype=np.float64)
    Y = np.asarray(feats2, dtype=np.float64)
    m, n = len(X), len(Y)
    Kxx = _polynomial_kernel(X, degree=degree, gamma=gamma, coef0=coef0)
    Kyy = _polynomial_kernel(Y, degree=degree, gamma=gamma, coef0=coef0)
    Kxy = _polynomial_kernel(X, Y, degree=degree, gamma=gamma, coef0=coef0)
    mmd2 = (
        (Kxx.sum() - np.trace(Kxx)) / (m * (m - 1))
        + (Kyy.sum() - np.trace(Kyy)) / (n * (n - 1))
        - 2 * Kxy.mean()
    )
    return float(mmd2)
