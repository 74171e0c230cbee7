#!/bin/sh
# CI entry point: builds the native libs and runs the suite.
# Fails loudly when the libopus oracle is missing (most differential
# tests would silently skip) unless ALLOW_NO_ORACLE=1.
set -e
cd "$(dirname "$0")"

./native/build.sh

if ! python -c "from mousiki_tpu.testing import oracle; \
                raise SystemExit(0 if oracle.available() else 1)"; then
    if [ "${ALLOW_NO_ORACLE:-0}" != "1" ]; then
        echo "ERROR: libopus oracle not available - the differential" >&2
        echo "test layer would be skipped. Install libopus (1.3+) or" >&2
        echo "re-run with ALLOW_NO_ORACLE=1 to accept reduced coverage." >&2
        exit 1
    fi
    echo "WARNING: running WITHOUT the libopus oracle (reduced coverage)"
fi

exec python -m pytest tests/ -q "$@"
