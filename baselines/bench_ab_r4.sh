#!/bin/bash
# Round-4 endgame bench A/B: pick the fastest attention routing for the
# flagship sampling config (what bench.py measures), using the arms
# precompiled into .jax_cache during session 4 (baselines/memory_probe.py).
#
#   arm1: default        — Pallas fused attention everywhere it gates on
#   arm2: PALLAS=0       — XLA einsum everywhere (d-minor applies on the
#                          temporal axis: <64 tokens over >=64 pixels)
#   arm3: TEMPORAL=0     — spatial stays fused Pallas, temporal routes to
#                          the einsum/d-minor path (VDT_PALLAS_ATTN_TEMPORAL)
#
# Precondition: the chip is idle (trainer dead). Each warm run ~2 min.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=baselines/bench_ab_r4.json
echo "{" > "$OUT.tmp"
first=1
run_arm() {
  local name=$1; shift
  echo "=== $name: $* python bench.py ===" >&2
  local line
  line=$(env "$@" python bench.py 2>/dev/null | tail -1)
  echo "$name -> $line" >&2
  [ $first -eq 0 ] && echo "," >> "$OUT.tmp"
  first=0
  printf ' "%s": %s' "$name" "${line:-null}" >> "$OUT.tmp"
}
run_arm pallas_all     VDT_PALLAS_ATTN=1
run_arm einsum_dminor  VDT_PALLAS_ATTN=0
run_arm pallas_spatial_only VDT_PALLAS_ATTN=1 VDT_PALLAS_ATTN_TEMPORAL=0
echo "" >> "$OUT.tmp"
echo "}" >> "$OUT.tmp"
mv "$OUT.tmp" "$OUT"
echo "wrote $OUT" >&2
cat "$OUT"
