# leafgrasp-tpu serving image (TPU VM host).
# Replaces the reference's CUDA/ROS container (reference Dockerfile):
# the runtime needs only JAX with the TPU PJRT plugin plus this package;
# transport is the in-process frame bus instead of a ROS master.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/leafgrasp-tpu
COPY pyproject.toml README.md ./
COPY leafgrasp_tpu ./leafgrasp_tpu
COPY native ./native
COPY examples ./examples

RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .[host] \
    && make -C native

ENV JAX_COMPILATION_CACHE_DIR=/var/cache/leafgrasp-jax
ENTRYPOINT ["python", "examples/run_pipeline_demo.py"]
