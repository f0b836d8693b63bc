#!/usr/bin/env bash
# Round-5 probe queue C: silicon verify of the round-5 tree (i8 extended
# paths + zero-copy glue), then clean same-window A/Bs.  Serialized.
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

VERIFY_SNIPPET="
import numpy as np
from ndzip_tpu import codec_pallas, golden
rng = np.random.default_rng(5)
for shape, dt in [((4096*8+100,), np.float32), ((128,512), np.float32),
                  ((16,32,128), np.float32), ((128,70), np.float64),
                  ((32,16,128), np.float64)]:
    data = rng.standard_normal(shape).astype(dt); data.reshape(-1)[:200]=0
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl and s.tobytes() == g.tobytes(), f'enc {shape}'
    out = codec_pallas.decompress(g, shape, dt)
    wdt = np.uint64 if dt == np.float64 else np.uint32
    assert np.array_equal(out.view(wdt), data.view(wdt)), f'dec {shape}'
    print(shape, 'OK')"

# 1. Full verify of the round-5 tree, default arithmetic (bf16 quarters).
step verify_r5 2400 python -c "$VERIFY_SNIPPET"

# 2. Same with the extended i8 paths engaged.
step verify_r5_i8 2400 env NDZIP_TPU_I8_MM=1 python -c "$VERIFY_SNIPPET"

# 3. Clean same-window A/B at bench knobs on the final tree.
step r5_dec_base 3600 env NDZIP_TPU_G_DEC=32 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 16777216 --dtype float
step r5_dec_i8 3600 env NDZIP_TPU_I8_MM=1 NDZIP_TPU_G_DEC=32 \
    NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py \
    --shape 16777216 --dtype float
step r5_fp64_i8 3600 env NDZIP_TPU_I8_MM=1 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 8388608 --dtype double
step r5_cesm_i8 3600 env NDZIP_TPU_I8_MM=1 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 1800x3600 --dtype float
step r5_cube_i8 3600 env NDZIP_TPU_I8_MM=1 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 256x256x256 --dtype float

# 4. Stage attributions on the final tree (retry of the r5b failures).
step dec_stage2 5400 env NDZIP_TPU_G_DEC=32 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/kernel_stage_probe.py --which dec
step enc_stage2 5400 python dev/kernel_stage_probe.py --which enc

echo "=== done ($(date -u +%H:%M:%S)) ==="
cat "$LOG/summary.txt"
