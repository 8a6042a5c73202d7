# gyre-tpu deployment image (the reference builds CUDA wheel stacks,
# Dockerfile:9-382; a TPU host needs only python + jax[tpu]).
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY gyre_tpu ./gyre_tpu
COPY config ./config
COPY client.py server.py ./

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    grpcio protobuf pyyaml pillow regex safetensors numpy

EXPOSE 50051 5000
ENV SD_LISTEN_TO_ALL=1
CMD ["python", "-m", "gyre_tpu.server", "--enginecfg", "config/engines.yaml"]
