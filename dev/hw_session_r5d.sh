#!/usr/bin/env bash
# Round-5 probe queue D: refresh every headline number at the new i8
# defaults (BENCH_LAST + the FULL config set), then the leftover sweeps
# (encode G16, decode G 24/40).  Serialized — one TPU process at a time.
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

# 1. Headline bench at the new defaults, FULL config set (first run pays
#    the fresh i8-variant compiles into the persistent cache).
step bench_full 10800 env NDZIP_TPU_BENCH_FULL=1 python bench.py
step bench_repeat 5400 env NDZIP_TPU_BENCH_FULL=1 python bench.py

# 2. Remaining named configs at i8 defaults (fp64 3D + the 2 GiB 3D).
step r5_fp64cube 5400 env NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 512x512x512 --dtype double

# 3. Encode G sweep: G_ENC=16 (fresh compile >10 min once; cached after).
step enc_g16 5400 env NDZIP_TPU_G_ENC=16 \
    python dev/shape_probe.py --shape 16777216 --dtype float

# 4. Decode G sweep around the pin at i8 defaults.
step dec_g40 3600 env NDZIP_TPU_G_DEC=40 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 16777216 --dtype float
step dec_g24 3600 env NDZIP_TPU_G_DEC=24 NDZIP_TPU_WIN_ROWS=adaptive \
    python dev/shape_probe.py --shape 16777216 --dtype float

# 5. s8 MXU encode-assembly re-evaluation (the bf16 variants lost in r4;
#    the i8 arithmetic removes the cast chains that sank them).
#    Correctness on silicon first, then the A/B.
step verify_mxu_i8 2400 env NDZIP_TPU_MXU_MERGE=1 NDZIP_TPU_MXU_SCAN=1 python -c "
import numpy as np
from ndzip_tpu import codec_pallas, golden
rng = np.random.default_rng(5)
for shape, dt in [((4096*8+100,), np.float32), ((128,512), np.float32),
                  ((128,70), np.float64)]:
    data = rng.standard_normal(shape).astype(dt); data.reshape(-1)[:200]=0
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl and s.tobytes() == g.tobytes(), f'enc {shape}'
    print(shape, 'OK')"
step enc_mxu_merge 3600 env NDZIP_TPU_MXU_MERGE=1 \
    python dev/shape_probe.py --shape 16777216 --dtype float
step enc_mxu_scan 3600 env NDZIP_TPU_MXU_SCAN=1 \
    python dev/shape_probe.py --shape 16777216 --dtype float
step enc_mxu_both 3600 env NDZIP_TPU_MXU_MERGE=1 NDZIP_TPU_MXU_SCAN=1 \
    python dev/shape_probe.py --shape 16777216 --dtype float

echo "=== done ($(date -u +%H:%M:%S)) ==="
cat "$LOG/summary.txt"
