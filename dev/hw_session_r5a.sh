#!/usr/bin/env bash
# Round-5 probe queue A: decode attribution + grid-batch sweeps on the
# live tunnel.  Serialized — one TPU process at a time.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-dev/hw_logs_r5}
mkdir -p "$LOG"
export NDZIP_TPU_CACHE_DIR=${NDZIP_TPU_CACHE_DIR:-$HOME/.cache/ndzip_tpu/xla}

step() {  # step <name> <timeout-seconds> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date -u +%H:%M:%S)) ==="
    timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
    local rc=$?
    echo "$name rc=$rc" | tee -a "$LOG/summary.txt"
    tail -12 "$LOG/$name.log" | grep -v WARNING
}

# 1. decode stage attribution at bench's exact knobs (G=32, adaptive win)
step dec_stage 5400 env NDZIP_TPU_G_DEC=32 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/kernel_stage_probe.py --which dec

# 2. G_DEC sweep around the pin: 24 / 40 (32 is the bench pin, measured)
step dec_g40 3600 env NDZIP_TPU_G_DEC=40 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 16777216 --dtype float
step dec_g24 3600 env NDZIP_TPU_G_DEC=24 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 16777216 --dtype float

# 3. encode stage attribution on the current tree
step enc_stage 5400 python dev/kernel_stage_probe.py --which enc

# 4. encode G=16 (fresh compile >10 min once; cached after)
step enc_g16 5400 env NDZIP_TPU_G_ENC=16 \
    python dev/shape_probe.py --shape 16777216 --dtype float

echo "=== done ($(date -u +%H:%M:%S)) ==="
cat "$LOG/summary.txt"
