#!/bin/sh
# Lint gate -- parity with the reference's only automated check
# (/root/reference lint.sh runs mypy over its consumer script).  The repo
# is fully type-annotated; this gate typechecks the package when mypy is
# available and falls back to a bytecode-compile pass otherwise (this
# container ships no mypy and pip installs are not permitted -- same
# environment-gating pattern as tests/test_iceberg.py: the check stands
# ready and runs for real the moment the tool lands).
#
# Usage: sh tools/lint.sh   (exit 0 = clean)
set -e
cd "$(dirname "$0")/.."

if python -c "import mypy" 2>/dev/null; then
    echo "mypy $(python -m mypy --version 2>/dev/null | head -1)"
    python -m mypy --ignore-missing-imports --no-error-summary \
        mariadb_to_graylog_spark/ jobs/ tools/ bench.py __spark_entry__.py
    echo "lint: mypy clean"
else
    echo "lint: mypy not installed in this environment; running syntax gate"
    python -m compileall -q mariadb_to_graylog_spark jobs tools tests \
        bench.py __spark_entry__.py
    echo "lint: compileall clean (install mypy for the full typecheck)"
fi
