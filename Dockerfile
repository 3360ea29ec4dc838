# Training image (CPU / TPU-VM host). On a TPU VM the libtpu wheel from
# the jax[tpu] extra provides the device runtime; elsewhere everything
# runs on the CPU backend (tests, data prep, small scenes).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ \
    libgl1 \
    libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/opensplat_tpu
COPY pyproject.toml README.md ./
COPY opensplat_tpu ./opensplat_tpu
COPY tools ./tools
COPY bench.py ./

ARG JAX_VARIANT=jax
# TPU VMs: --build-arg JAX_VARIANT="jax[tpu]"
RUN pip install --no-cache-dir "${JAX_VARIANT}" && \
    pip install --no-cache-dir -e .[data]

ENTRYPOINT ["opensplat"]
