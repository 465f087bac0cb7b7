# Reproducible environment for tacotron2-tpu — the TPU-native equivalent
# of the reference's CUDA image (/root/reference/Dockerfile:1-10, which
# pins pytorch+cuDNN, Apex with CUDA extensions, librosa 0.6, TF 1.15).
# Here the stack is jax[tpu] + a C++ toolchain for the native DSP library;
# librosa/TF/inflect/unidecode are NOT needed (own filterbank, config,
# number expansion, and transliterator — see text/ and audio/filters.py).
#
# Build:  docker build -t tacotron2-tpu .
# Run (on a TPU VM, privileged for /dev/accel*):
#   docker run --privileged --net=host -v /path/to/LJSpeech:/data \
#       tacotron2-tpu python -m tacotron2_tpu.train -o /out -l logs
FROM python:3.12-slim

RUN apt-get update -y && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

# Version pins match the environment the benchmarks were recorded on
# (PERFORMANCE.md / BENCH_DETAILS.json). jax[tpu] pulls the matching
# libtpu from the Google releases index.
RUN pip install --no-cache-dir \
        "jax[tpu]==0.9.0" \
        "numpy>=2.0" \
        "scipy>=1.14" \
        "optax==0.2.6" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# Optional extras: observability (TensorBoard images) and the torch-based
# checkpoint converters / test oracles. Comment out for a lean image.
RUN pip install --no-cache-dir tensorboard matplotlib pillow pytest && \
    pip install --no-cache-dir torch --index-url \
        https://download.pytorch.org/whl/cpu

WORKDIR /opt/tacotron2-tpu
COPY pyproject.toml README.md ./
COPY tacotron2_tpu ./tacotron2_tpu
COPY native ./native
COPY tools ./tools
COPY tests ./tests
COPY bench.py __graft_entry__.py ./

# Native DSP library (host-side mel extraction, native/mel_extract.cc)
RUN sh native/build.sh

RUN pip install --no-cache-dir -e .

CMD ["python", "-m", "pytest", "tests", "-q", "-m", "not slow"]
