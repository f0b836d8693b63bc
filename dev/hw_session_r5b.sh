#!/usr/bin/env bash
# Round-5 probe queue B: I8_MM (s8 MXU select) correctness + A/B first,
# then the r5a attribution/sweep queue.  Serialized — one TPU process at
# a time.
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

# 1. I8_MM correctness on silicon (same 5-shape golden equality as the
#    standard verify step, with the s8 select path engaged).
step verify_i8 2400 env NDZIP_TPU_I8_MM=1 python -c "
import numpy as np
from ndzip_tpu import codec_pallas, golden
rng = np.random.default_rng(5)
for shape, dt in [((4096*8+100,), np.float32), ((128,512), np.float32),
                  ((16,32,128), np.float32), ((128,70), np.float64),
                  ((32,16,128), np.float64)]:
    data = rng.standard_normal(shape).astype(dt); data.reshape(-1)[:200]=0
    g, gl = golden.compress(data)
    out = codec_pallas.decompress(g, shape, dt)
    wdt = np.uint64 if dt == np.float64 else np.uint32
    assert np.array_equal(out.view(wdt), data.view(wdt)), f'dec {shape}'
    print(shape, 'OK')"

# 2. I8 A/B at bench knobs (G_DEC=32, adaptive win), fp32 1D 2^24 + fp64.
step dec_i8 3600 env NDZIP_TPU_I8_MM=1 NDZIP_TPU_G_DEC=32 \
    NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py \
    --shape 16777216 --dtype float
step dec_base 3600 env NDZIP_TPU_G_DEC=32 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 16777216 --dtype float
step dec_i8_fp64 3600 env NDZIP_TPU_I8_MM=1 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 8388608 --dtype double

# 3. XLA glue cost around the pallas decode call.
step glue 3600 env NDZIP_TPU_G_DEC=32 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/glue_probe.py

# 4. decode stage attribution at bench's exact knobs
step dec_stage 5400 env NDZIP_TPU_G_DEC=32 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/kernel_stage_probe.py --which dec

# 5. encode stage attribution on the current tree
step enc_stage 5400 python dev/kernel_stage_probe.py --which enc

echo "=== done ($(date -u +%H:%M:%S)) ==="
cat "$LOG/summary.txt"
