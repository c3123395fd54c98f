# Reproducible container for bart_tpu (reference parity: the reference
# ships a Singularity definition building Ubuntu 20.04 + conda + MPICH;
# see /root/reference Singularity and SURVEY.md section 1 packaging row).
#
# CPU image by default; on a TPU VM swap the jax pin for
# `pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html`.
FROM python:3.12-slim

# g++ builds the native HITRAN line scanner (bart_tpu/native/hitran_scan.cpp)
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /opt/bart_tpu
COPY pyproject.toml README.md ./
COPY bart_tpu ./bart_tpu
COPY tests ./tests
COPY examples ./examples

RUN pip install --no-cache-dir -e ".[test]"

# Smoke: full test pyramid on an 8-virtual-device CPU mesh.
# (Run `docker build --build-arg RUN_TESTS=1 .` to gate the image on green.)
ARG RUN_TESTS=0
RUN if [ "$RUN_TESTS" = "1" ]; then python -m pytest tests/ -q; fi

ENTRYPOINT ["bart-tpu"]
