#!/bin/sh
# TPU-VM setup: the no-container equivalent of the Dockerfile — run once
# on a fresh Cloud TPU VM (which already has /dev/accel* and a Python).
# Pins match the benchmark environment (PERFORMANCE.md).
set -e

python3 -m pip install --upgrade pip
python3 -m pip install \
    "jax[tpu]==0.9.0" "numpy>=2.0" "scipy>=1.14" "optax==0.2.6" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
# optional: observability + converter/test extras
python3 -m pip install tensorboard matplotlib pillow pytest
python3 -m pip install torch --index-url https://download.pytorch.org/whl/cpu

# native DSP library (needs g++; `sudo apt-get install -y g++` if absent)
sh "$(dirname "$0")/../native/build.sh"

# install the package itself (editable, from the repo root)
python3 -m pip install -e "$(dirname "$0")/.."

echo "tacotron2-tpu ready. Smoke test: python3 -m pytest tests -q -m 'not slow'"
