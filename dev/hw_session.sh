#!/usr/bin/env bash
# Unattended hardware-validation session for the round-2 kernel changes.
# Runs the full measurement queue in priority order once the TPU tunnel is
# reachable, logging everything under dev/hw_logs/.  Each step has its own
# timeout and failures don't stop later steps (first compiles of fresh
# kernel shapes can take minutes; the persistent compile cache makes
# repeat runs cheap).
#
# Usage:  bash dev/hw_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-dev/hw_logs}
mkdir -p "$LOG"
export NDZIP_TPU_CACHE_DIR=${NDZIP_TPU_CACHE_DIR:-$HOME/.cache/ndzip_tpu/xla}

step() {  # step <name> <timeout-seconds> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date -u +%H:%M:%S)) ==="
    timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
    local rc=$?
    echo "$name rc=$rc" | tee -a "$LOG/summary.txt"
    tail -5 "$LOG/$name.log"
}

# 0. Wait for the tunnel (a trivial op; the remote compile helper may
#    still be grinding older requests — poll, never kill).  NDZIP_TPU_POLLS
#    bounds the wait (default ~10 h so an unattended round-long session
#    catches any tunnel window).
#
# PRIORITY CONTRACT for partial tunnel windows (VERDICT r2 weak #7):
# correctness before perf — (1) verify_kernels, (2) smoke suite, then
# (3) bench, (4) named configs, (5+) probes/ablations.  If the tunnel
# drops mid-queue, whatever completed in order is the round's evidence.
alive=0
for i in $(seq 1 "${NDZIP_TPU_POLLS:-600}"); do
    if timeout 120 python -c "import jax,jax.numpy as jnp; print(jnp.arange(4).sum())" \
        >/dev/null 2>&1; then echo "TPU alive (attempt $i)"; alive=1; break; fi
    echo "tunnel poll $i failed; sleeping 60s"; sleep 60
done
if [ "$alive" != 1 ]; then
    echo "tunnel never came up; aborting" | tee -a "$LOG/summary.txt"
    exit 1
fi

# 1. REQUIRED kernel-equality check on hardware (verify skill recipe):
#    flat + tiled + borders, both dtypes, against golden.
step verify_kernels 2400 python -c "
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

# 2. Mosaic smoke suite (all compiled path classes + merge-gate extremes).
step smoke 3600 env NDZIP_TPU_TESTS_TPU=1 python -m pytest tests/test_tpu_smoke.py -x -q

# 3. Warm the compile cache for every shape bench.py touches, at bench's
#    exact G knobs (G_ENC default, G_DEC=32 fp32 / default fp64).  bench
#    decodes at ADAPTIVE window buckets; --win-rows pre-compiles the
#    bucket the smooth synthetic data most likely lands in (22 fp32 at
#    ratio ~0.6, 26 fp64) on top of the worst-case default — any bucket
#    missed here is compiled by the bench step itself and cached for the
#    driver's later default run.
step warm_bench_shapes 10800 env NDZIP_TPU_G_DEC=32 python -m ndzip_tpu.warm \
    --shapes 16777216 1800x3600 256x256x256 --dtype float --win-rows 22
step warm_bench_fp64 10800 python -m ndzip_tpu.warm \
    --shapes 8388608 512x512x512 --dtype double --win-rows 26

# 4. Headline bench (fp32 1D enc+dec + CESM + 256^3 by default; FULL adds
#    fp64 512^3).  bench picks adaptive decode-window buckets from each
#    stream's header, so its first run also pays those kernels' compiles
#    into the persistent cache (hence the wide timeout); the driver's
#    later default bench run starts warm.
step bench 10800 env NDZIP_TPU_BENCH_FULL=1 python bench.py
step bench_repeat 5400 env NDZIP_TPU_BENCH_FULL=1 python bench.py

# 5. Named BASELINE configs: CESM 2D unaligned minor (padded decode path),
#    3D 256^3, fp64 1D — at the same adaptive-window policy bench uses.
step cesm 3600 env NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py --shape 1800x3600 --dtype float
step cube3d 3600 env NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py --shape 256x256x256 --dtype float
step fp64_1d 3600 env NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py --shape 8388608 --dtype double

# 5b. Adaptive-window ablation (bucket vs worst case, same shape/G) and a
#     larger decode grid batch: smaller windows shrink the VMEM window
#     scratch, so G_DEC=48 may now fit where G=64/win=34 OOM'd.
step win_adaptive 3600 env NDZIP_TPU_WIN_ROWS=adaptive NDZIP_TPU_G_DEC=32 python dev/shape_probe.py --shape 16777216 --dtype float
step win_worst 3600 env NDZIP_TPU_G_DEC=32 python dev/shape_probe.py --shape 16777216 --dtype float
step win_g48 5400 env NDZIP_TPU_WIN_ROWS=adaptive NDZIP_TPU_G_DEC=48 python dev/shape_probe.py --shape 16777216 --dtype float

# 5c. Batched multi-GB 3D fp32 (BASELINE config 4 scale: 2 GiB).
step big3d 5400 env NDZIP_TPU_WIN_ROWS=adaptive python dev/shape_probe.py --shape 512x512x2048 --dtype float

# 6. Tile adapter variants (gather vs XOR butterfly) -> adoption decision.
step tile_xpose 3600 python dev/tile_xpose_probe.py --g 16

# 5d. Offloader timing paths on silicon (device-fenced + measure()).
step offloader 2400 python dev/offloader_probe.py --mb 16

# 6. Encode pipeline floor + stage attribution with the new merge.
step enc_floor 3600 python dev/enc_floor_probe.py --g 8
step stage_probe 3600 python dev/kernel_stage_probe.py

# 7. Warm-cache first-call latency (VERDICT: warmed shape < 5 s).
step warm_first_call 1800 bash -c '
python -m ndzip_tpu.warm --shapes 16777216 --dtype float &&
python - <<EOF
import time, numpy as np
t0 = time.time()
import ndzip_tpu
data = np.sin(np.arange(2**24, dtype=np.float32)*1e-4).astype(np.float32)
stream, n = ndzip_tpu.compress(data)
print("first-call wall s:", time.time() - t0)
EOF'

echo "=== done ($(date -u +%H:%M:%S)) ==="
cat "$LOG/summary.txt"
