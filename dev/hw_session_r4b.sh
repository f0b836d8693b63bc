#!/usr/bin/env bash
# Round-4b hardware queue: measure the border-rework (static-slice border
# take/place replacing gathers/scatters) and the butterfly tile adapters,
# then refresh stage attribution.  Correctness before perf, as in
# hw_session.sh.  Usage: bash dev/hw_session_r4b.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-dev/hw_logs_r4b}
mkdir -p "$LOG"
export NDZIP_TPU_CACHE_DIR=${NDZIP_TPU_CACHE_DIR:-$HOME/.cache/ndzip_tpu/xla}

step() {
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date -u +%H:%M:%S)) ==="
    timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
    local rc=$?
    echo "$name rc=$rc" | tee -a "$LOG/summary.txt"
    tail -5 "$LOG/$name.log"
}

alive=0
for i in $(seq 1 "${NDZIP_TPU_POLLS:-60}"); do
    if timeout 120 python -c "import jax,jax.numpy as jnp; print(jnp.arange(4).sum())" \
        >/dev/null 2>&1; then echo "TPU alive (attempt $i)"; alive=1; break; fi
    echo "tunnel poll $i failed; sleeping 60s"; sleep 60
done
if [ "$alive" != 1 ]; then
    echo "tunnel never came up; aborting" | tee -a "$LOG/summary.txt"
    exit 1
fi

# 1. Kernel equality on hardware (bordered shapes exercise the new
#    border take/place; 2D/3D shapes exercise the butterfly adapters).
step verify_kernels 2400 python -c "
import numpy as np
from ndzip_tpu import codec_pallas, golden
rng = np.random.default_rng(5)
for shape, dt in [((4096*8+100,), np.float32), ((128,512), np.float32),
                  ((1800,3600), np.float32), ((16,32,128), np.float32),
                  ((20,33,40), np.float32), ((128,70), np.float64),
                  ((32,16,128), np.float64)]:
    data = rng.standard_normal(shape).astype(dt); data.reshape(-1)[:200]=0
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl and s.tobytes() == g.tobytes(), f'enc {shape}'
    out = codec_pallas.decompress(g, shape, dt)
    wdt = np.uint64 if dt == np.float64 else np.uint32
    assert np.array_equal(out.view(wdt), data.view(wdt)), f'dec {shape}'
    print(shape, 'OK')"

# 2. The bordered configs the rework targets.
step cesm 3600 env NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py --shape 1800x3600 --dtype float
step cube3d 3600 env NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py --shape 256x256x256 --dtype float
step fp64_3d 3600 env NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py --shape 128x128x128 --dtype double
step fp32_1d_border 3600 env NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py --shape 16777249 --dtype float

# 3. Headline refresh at the new kernels.
step bench 10800 env NDZIP_TPU_BENCH_FULL=1 python bench.py

# 4. Stage attribution with the fixed probe (encode first: it is the
#    bigger deficit).
step stage_enc 3600 python dev/kernel_stage_probe.py --which enc
step stage_dec 3600 python dev/kernel_stage_probe.py --which dec
step enc_floor 3600 python dev/enc_floor_probe.py --g 8

echo "=== done ($(date -u +%H:%M:%S)) ==="
cat "$LOG/summary.txt"
