#!/usr/bin/env bash
# Round-5 probe queue E: verify the shift_flat micro-opt tree on silicon,
# then the fp64 G_DEC64=32 experiment (adaptive windows shrink the VMEM
# scratch that OOM'd G=32 at the worst-case win=34).  Serialized.
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

# 1. Verify the current tree (i8 defaults + shift_flat rewrite).
step verify_r5e 2400 python -c "
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

# 2. fp64 decode grid batch sweep: 32 (new; adaptive windows cut the
#    window scratch ~2x vs the win=34 OOM config) and 24.
step fp64_g32 5400 env NDZIP_TPU_G_DEC64=32 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 8388608 --dtype double
step fp64_g24 5400 env NDZIP_TPU_G_DEC64=24 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 8388608 --dtype double

# 3. Re-measure the bench headline on this exact tree (shift_flat in).
step r5e_dec 3600 env NDZIP_TPU_G_DEC=32 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 16777216 --dtype float

# 4. Decode G=40 confirmation (72.7 GB/s in the first sweep) + G=48.
step dec_g40_b 3600 env NDZIP_TPU_G_DEC=40 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 16777216 --dtype float
step dec_g48 5400 env NDZIP_TPU_G_DEC=48 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 16777216 --dtype float

# 5. MXU merge retry with the i1->i32->i8 cast fix.
step verify_mxu_merge 2400 env NDZIP_TPU_MXU_MERGE=1 python -c "
import numpy as np
from ndzip_tpu import codec_pallas, golden
rng = np.random.default_rng(5)
for shape, dt in [((4096*8+100,), np.float32), ((128,70), np.float64)]:
    data = rng.standard_normal(shape).astype(dt); data.reshape(-1)[:200]=0
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl and s.tobytes() == g.tobytes(), f'enc {shape}'
    print(shape, 'OK')"
step enc_mxu_merge_b 3600 env NDZIP_TPU_MXU_MERGE=1 \
    python dev/shape_probe.py --shape 16777216 --dtype float

echo "=== done ($(date -u +%H:%M:%S)) ==="
cat "$LOG/summary.txt"
