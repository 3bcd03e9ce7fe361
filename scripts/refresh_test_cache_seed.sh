#!/bin/bash
# Regenerate tests/data/compile_cache_seed.tar.gz — the committed XLA
# compile-cache seed that keeps a COLD fast-tier run under the 300 s budget
# (tests/conftest.py extracts it into an empty cache dir).
#
# Run after changing any traced code (renderer/trainer/sharding/guidance):
# stale entries are harmless (key miss -> normal compile) but dead weight.
# The run itself uses a scratch dir so the shared cache never leaks
# unrelated entries into the seed.
set -eu
cd "$(dirname "$0")/.."
SCRATCH=$(mktemp -d /tmp/seed_cache.XXXX)
trap 'rm -rf "$SCRATCH"' EXIT
echo "cold fast-tier run into $SCRATCH (expect ~10-15 min)..."
MORPHEUS_TEST_CACHE="$SCRATCH" MORPHEUS_TEST_CACHE_NOSEED=1 \
    python -m pytest tests/ -q
mkdir -p tests/data
tar czf tests/data/compile_cache_seed.tar.gz -C "$SCRATCH" .
du -sh tests/data/compile_cache_seed.tar.gz
echo "seed refreshed; commit tests/data/compile_cache_seed.tar.gz"
