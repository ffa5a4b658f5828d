# tpufft runtime image (role of the reference's Dockerfile/docker-compose:
# a reproducible environment for tests and benchmarks). On a TPU VM the
# jax[tpu] wheel picks up the libtpu runtime; on CPU-only hosts the test
# suite runs via Pallas interpret mode (tests/conftest.py pins CPU anyway).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/tpufft
COPY pyproject.toml README.md ./
COPY tpufft ./tpufft
COPY native ./native
COPY tests ./tests
COPY bench.py bench_suite.py profile.py ./

# CPU image by default; for TPU VMs use:  pip install 'jax[tpu]' -f \
#   https://storage.googleapis.com/jax-releases/libtpu_releases.html
# libfftw3 + pyfftw: the FFTW_MEASURE baseline column of bench_suite.py
# (matches the reference's benchmark-cpu-others/benchmark.py:52-57 harness;
# bench_suite emits the column whenever pyfftw imports).
RUN apt-get update && apt-get install -y --no-install-recommends \
        libfftw3-dev \
    && rm -rf /var/lib/apt/lists/*
RUN pip install --no-cache-dir jax numpy scipy pytest pyfftw && \
    pip install --no-cache-dir -e .

CMD ["python", "-m", "pytest", "tests/", "-q"]
