#!/usr/bin/env bash
# Build the native C++ components (ref role: scripts/build_rnnt.sh, which
# cmake-built warp-transducer; here one g++ invocation via build.py).
set -euo pipefail
cd "$(dirname "$0")/.."
python -c "from rnnt_tpu.native.build import build; print('built', build(force=True))"
