#!/usr/bin/env bash
# Full test suite in bounded sequential shards (a single `pytest tests/`
# exceeds 10 minutes on a shared CPU; shards keep each invocation short).
# Fast iteration: `python -m pytest tests/ -q -m 'not slow'` (~4-6 min).
set -e
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"

run() { echo "== $*"; python -m pytest -q -p no:cacheprovider "$@"; }

run tests/ -m "not slow"
run tests/test_quant.py tests/test_sharding.py tests/test_composite_converters.py \
    tests/test_swin.py tests/test_resnet.py -m slow
run tests/test_train.py tests/test_t5.py tests/test_hf_text.py \
    tests/test_convnext.py tests/test_presets.py tests/test_multiprocess.py -m slow
run tests/test_coca.py tests/test_models_extra.py tests/test_train_main.py \
    tests/test_eva.py -m slow
echo "ALL GREEN"
