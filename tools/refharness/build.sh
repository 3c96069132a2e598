#!/bin/bash
# Build the reference-executor oracle REPL. Zero crate deps; works with
# COURSIER/cargo offline. Usage: tools/refharness/build.sh [/path/to/reference]
set -euo pipefail
cd "$(dirname "$0")"
python3 prepare.py "${1:-/root/reference}"
cargo build --offline --release
echo "oracle binary: $(pwd)/target/release/refharness"
