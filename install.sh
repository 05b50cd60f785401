#!/usr/bin/env bash
# Environment setup (reference install.sh analog). The TPU framework's
# dependencies (jax, optax, orbax, numpy, opencv, imageio, tensorboardX)
# ship in the base image / pyproject; this script only installs the
# package itself and builds the native data engine.
set -e
pip install -e . 2>/dev/null || \
    echo "pip unavailable/offline: add $(pwd) to PYTHONPATH instead"
python -c "from instantavatar_tpu.data.native_loader import build_native_lib; \
           print('native data engine:', build_native_lib())" || \
    echo "native loader build skipped (g++/libpng missing) — Python path is used"
echo "Done. SMPL body models are license-gated: download SMPL_*.pkl into data/SMPLX/smpl/"
