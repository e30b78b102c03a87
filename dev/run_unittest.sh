#!/bin/bash
# Test gate (reference dev/run_unittest.sh): full suite on the virtual
# 8-device CPU mesh. PYTHONPATH is dropped to bypass TPU-tunnel
# sitecustomize overhead (see .claude/skills/verify/SKILL.md).
set -e
cd "$(dirname "$0")/.."
env -u PYTHONPATH python -m pytest tests/ -q --disable-warnings "$@"
