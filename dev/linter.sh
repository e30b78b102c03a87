#!/bin/bash
# Lint gate (reference dev/linter.sh: autoflake+isort+black+flake8+clang-format).
# Uses whatever of those is available; always runs the zero-dependency checks.
set -e
cd "$(dirname "$0")/.."
echo "-- python syntax check"
python -m compileall -q ir_ads_tpu tools tests *.py
if command -v black >/dev/null; then
  echo "-- black"; black --check --line-length 100 ir_ads_tpu tools tests || true
fi
if command -v flake8 >/dev/null; then
  echo "-- flake8"; flake8 --max-line-length 100 ir_ads_tpu || true
fi
if command -v clang-format >/dev/null; then
  echo "-- clang-format"; clang-format --dry-run -Werror native/*.cpp || true
fi
echo "lint done"
