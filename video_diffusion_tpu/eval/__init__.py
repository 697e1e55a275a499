from .metrics import ssim, psnr, frechet_distance, kid  # noqa: F401
