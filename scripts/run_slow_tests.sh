#!/bin/sh
# Opt-in heavy suite: full-Trainer end-to-end compiles + the pinned
# synthetic convergence regression.  The default `pytest tests/` skips
# these (tests/conftest.py) to stay CI-fast.
set -e
cd "$(dirname "$0")/.."
PCS_RUN_SLOW=1 exec python -m pytest tests/ -q -m slow "$@"
