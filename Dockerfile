# SegAlign-TPU container (CPU fallback works anywhere; TPU runtime comes
# from the host's libtpu / JAX plugin).
FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*
WORKDIR /opt/segalign_tpu
COPY segalign_tpu ./segalign_tpu
COPY setup.py README.md ./
RUN pip install --no-cache-dir "jax[cpu]" numpy && pip install .
ENTRYPOINT ["run_segalign"]
