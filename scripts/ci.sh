#!/bin/bash
# CI: build native lib, run the test suite on local CPU devices, smoke the
# CLIs (reference CI was build + --help only, .travis.yml:39-41; we do more).
set -e
cd "$(dirname "$0")/.."
python -c "from segalign_tpu.native import get_lib; assert get_lib() is not None, 'native build failed'"
python -m pytest tests/ -q -x --deselect tests/test_tpu_smoke.py
python -m segalign_tpu.cli.run_segalign --help > /dev/null
python -m segalign_tpu.cli.run_segalign_repeat_masker --help > /dev/null
echo "CI OK"
