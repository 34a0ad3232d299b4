#!/usr/bin/env bash
# Opt-in JPEG test lane (r9 verdict item 7): the base container installs
# nothing, so the PIL fallback in operators/multimodal.py is exercised in
# a throwaway venv with Pillow added. Run from the repo root on any
# machine with network access:
#
#   scripts/test_with_pillow.sh
#
# Creates .venv-pillow (reused across runs), installs pillow + the test
# deps if missing, and runs exactly the PIL-dependent tests — which SKIP
# in the base environment and must PASS here.
set -euo pipefail
cd "$(dirname "$0")/.."
VENV=.venv-pillow
if [ ! -d "$VENV" ]; then
    python -m venv --system-site-packages "$VENV"
fi
"$VENV/bin/pip" install --quiet pillow
"$VENV/bin/python" -m pytest tests/test_operators.py -q \
    -k "pil or jpeg" -rs
