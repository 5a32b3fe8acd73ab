#!/usr/bin/env bash
# Launcher with the reference run.sh's defaults (run.sh:13-16: batch 1024,
# 200 epochs, lr 0.1), forwarding any extra flags to `face train`.
#
# Usage: scripts/run.sh <head> [extra `face train` flags...]
set -euo pipefail

HEAD="${1:?usage: run.sh <head> [flags...]}"
shift || true

exec face train \
  --head "$HEAD" \
  --batch_size 1024 \
  --epochs 200 \
  -lr 0.1 \
  "$@"
