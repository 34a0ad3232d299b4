#!/usr/bin/env bash
# Opt-in JPEG test lane (r9 verdict item 7): the base container installs
# nothing, so the PIL fallback in operators/multimodal.py is exercised in
# a throwaway venv with Pillow added. Run from the repo root on any
# machine with network access:
#
#   scripts/test_with_pillow.sh
#
# Creates a throwaway venv OUTSIDE the repo (r15 verdict item 7: an
# in-repo venv polluted the LoC diagnostic and tripped the leak scan on
# pip's vendored data; override with SPARK_GRAFT_VENV_DIR), installs
# pillow if missing, and runs exactly the PIL-dependent tests — which
# SKIP in the base environment and must PASS here.
set -euo pipefail
cd "$(dirname "$0")/.."
# per-user default: a fixed world-shared /tmp path would fail (or run a
# previously-planted venv) for the second user on a shared machine
VENV="${SPARK_GRAFT_VENV_DIR:-${TMPDIR:-/tmp}/spark-graft-venvs-$(id -u)}/pillow"
mkdir -p "$(dirname "$VENV")"
if [ ! -d "$VENV" ]; then
    python -m venv --system-site-packages "$VENV"
fi
"$VENV/bin/pip" install --quiet pillow
"$VENV/bin/python" -m pytest tests/test_operators.py -q \
    -k "pil or jpeg" -rs
