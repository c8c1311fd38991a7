# Serving image (reference README declares `docker build` /
# `docker-compose up` / k8s deployment at README.md:86-96 without shipping
# any of it). Two build stages: native C++ index, then the runtime.
#
# TPU serving: run on a TPU VM / GKE TPU node pool with the libtpu wheel
# (`pip install jax[tpu]`) — the base image here is CPU-only so the same
# image also serves via the native flat index when no TPU is attached.

FROM python:3.12-slim AS native
RUN apt-get update && apt-get install -y --no-install-recommends g++ libgomp1 \
    && rm -rf /var/lib/apt/lists/*
WORKDIR /build
COPY twotower_tpu/native/flat_index.cpp twotower_tpu/native/
RUN g++ -O3 -march=x86-64-v2 -fopenmp -shared -fPIC \
    -o twotower_tpu/native/libflat_index.so twotower_tpu/native/flat_index.cpp

FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends libgomp1 curl \
    && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY pyproject.toml README.md ./
COPY twotower_tpu ./twotower_tpu
COPY configs ./configs
COPY --from=native /build/twotower_tpu/native/libflat_index.so ./twotower_tpu/native/
# Full runtime set: flax (train state pytrees), optax/orbax (optimizer,
# checkpoint restore), pandas+pyarrow (parquet data path for train jobs),
# aiohttp (serving front).
RUN pip install --no-cache-dir \
        jax flax optax orbax-checkpoint aiohttp numpy pyyaml pandas pyarrow \
    && pip install --no-cache-dir -e . --no-deps

# Checkpoints are mounted, not baked: models hot-reload via POST /admin/reload.
VOLUME /models
ENV CHECKPOINT_DIR=/models/ckpt PORT=8000
EXPOSE 8000
# Liveness only (/livez is always 200 while the process is up): /health
# 503s throughout a release-first reload, and a container restart there
# would destroy the in-progress rebuild.
HEALTHCHECK --interval=10s --timeout=3s --start-period=60s \
    CMD curl -sf http://localhost:8000/livez || exit 1
CMD serve-model --checkpoint-dir "$CHECKPOINT_DIR" --host 0.0.0.0 --port "$PORT"
