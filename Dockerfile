# TPU-host image for video-diffusion-tpu.
# (Counterpart of the reference's CUDA Dockerfile; on Cloud TPU VMs the
# libtpu runtime ships with the VM image, so this only layers Python deps.)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    ffmpeg git && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml ./
COPY video_diffusion_tpu ./video_diffusion_tpu
COPY scripts ./scripts
COPY datasets ./datasets
COPY tests ./tests

# jax[tpu] resolves libtpu on Cloud TPU VMs; CPU fallback works everywhere
RUN pip install --no-cache-dir "jax[tpu]" -f \
    https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
    pip install --no-cache-dir jax
RUN pip install --no-cache-dir -e ".[data,metrics]"

ENTRYPOINT ["python"]
