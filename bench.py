#!/usr/bin/env python
"""Headline benchmark: fp32 codec throughput on the configured TPU chip
(BASELINE.json config 1: 1D fp32, 2^24 elements).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

vs_baseline compares against BASELINE.json's north-star per-chip share:
100 GB/s aggregate on a v5e-16 == 6.25 GB/s per chip.

FAILURE CONTRACT (the graded artifact must always parse — the reference
harness emits a structured row per algorithm even on error,
/root/reference/src/benchmark/benchmark.cc:1320-1336): this script never
exits nonzero and never prints a bare traceback as its last line.  TPU
availability is probed in a SUBPROCESS (a failed in-process jax backend
init is not retryable) with a bounded poll loop (NDZIP_TPU_BENCH_POLLS x
60 s, default 10).  Every named sub-benchmark is fenced so one failure
cannot zero the others.  After any successful run the measured numbers
are cached in BENCH_LAST.json; an unavailable-backend artifact carries
them as "last_measured".

Timing methodology: device-only time, measured by chaining N invocations
inside one jitted fori_loop (each iteration's input depends on the loop
index so XLA cannot hoist or CSE the codec call) and syncing once.  Two
chain lengths (R1, R2) are timed and the per-rep device time is the slope
(t2 - t1) / (R2 - R1), which cancels the fixed host-sync cost exactly —
the analog of the reference's CUDA-event kernel timing
(/root/reference/src/benchmark/benchmark.cc:331-341; on this setup a
single host sync costs 30-60 ms of tunnel round-trip, which would swamp
the kernels).  Correctness (bit-exact round-trip) is asserted on every
run, as the reference does (benchmark.cc:263-265).
"""

import json
import os
import subprocess
import sys
import time
import traceback

import numpy as np

PER_CHIP_BASELINE_GBPS = 100.0 / 16.0  # north star / v5e-16 chips
R1, R2 = 10, 50
REPO = os.path.dirname(os.path.abspath(__file__))
LAST_PATH = os.path.join(REPO, "BENCH_LAST.json")


def emit(obj):
    """The one graded line, always last on stdout, always valid JSON."""
    print(json.dumps(obj), flush=True)


def load_last():
    try:
        with open(LAST_PATH) as f:
            return json.load(f)
    except Exception:
        return None


def save_last(result):
    try:
        with open(LAST_PATH, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    except Exception:
        pass  # caching must never break the bench


def probe_tpu_subprocess(timeout=150):
    """True iff a fresh process can run one op on the TPU backend.

    In-process probing is unsafe: if the axon plugin registers but the
    tunnel is down, jax's backend-init failure is cached for the life of
    the process (observed verbatim in BENCH_r02/BENCH_r03).
    """
    code = "import jax, jax.numpy as jnp; print(int(jnp.arange(4).sum()))"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout)
        return r.returncode == 0 and b"6" in r.stdout
    except Exception:
        return False


def wait_for_tpu():
    polls = int(os.environ.get("NDZIP_TPU_BENCH_POLLS", "10"))
    for i in range(max(polls, 1)):
        if probe_tpu_subprocess():
            return True, i + 1
        if i < polls - 1:
            time.sleep(60)
    return False, polls


def mt_scaling_probe():
    """VERDICT r3 #8: turn the 1-vCPU caveat into data.  If this host has
    >1 core, sweep the native MT codec over thread counts (the reference
    sweeps -T, benchmark.cc:193-228); else record the core count."""
    ncpu = os.cpu_count() or 1
    if ncpu <= 1:
        return "1-vcpu"
    try:
        from ndzip_tpu import native
        if not native.available():
            return f"{ncpu}-vcpu (native codec unavailable)"
        rng = np.random.default_rng(7)
        data = (np.sin(np.arange(2**22, dtype=np.float32) * 1e-4)
                + 0.001 * rng.standard_normal(2**22).astype(np.float32))
        table = {}
        threads = sorted({1, 2, 4, ncpu} & set(range(1, ncpu + 1)))
        for t in threads:
            native.compress(data, threads=t)  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                native.compress(data, threads=t)
                best = min(best, time.perf_counter() - t0)
            table[str(t)] = round(data.nbytes / best / 1e9, 3)
        return {"threads_to_compress_gbps": table, "ncpu": ncpu}
    except Exception as e:
        return f"{ncpu}-vcpu (probe failed: {type(e).__name__})"


def cpu_evidence():
    """Context carried by an unavailable-backend artifact."""
    info = {}
    last = load_last()
    if last is not None:
        info["last_measured"] = last
    info["mt_scaling"] = mt_scaling_probe()
    return info


def run_tpu_bench():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the codec's Mosaic kernels cost minutes to
    # compile fresh (G_DEC=32 fp32 decode ~400 s); cache them so repeat
    # bench runs start in seconds.  utils.enable_compilation_cache never
    # clobbers a cache the embedding application already configured.
    from ndzip_tpu import utils as _utils

    _utils.enable_compilation_cache()

    from ndzip_tpu import codec_pallas, codec_xla, format as fmt, golden

    shape = (2**24,)
    rng = np.random.default_rng(0)
    data = (np.sin(np.arange(shape[0], dtype=np.float32) * 1e-4)
            + 0.001 * rng.standard_normal(shape[0]).astype(np.float32))
    nbytes = data.nbytes

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        # peak-throughput decode batch (the library default favors
        # per-shape compile time; see codec_pallas G_* notes)
        codec_pallas.G_DEC = max(codec_pallas.G_DEC, 32)
        enc = lambda w: codec_pallas._encode_fp32_device(w, shape)
        pad_extra = codec_pallas.WIN_ROWS * codec_pallas.LANES
        backend = "pallas"
    else:
        enc = codec_xla.encode_fn(shape, 32)
        pad_extra = 0
        backend = "xla"

    words = jnp.asarray(data.view(np.uint32))
    padded, length = enc(words)
    length = int(length)

    bound = fmt.compressed_bound_u32(shape, 32)
    host_stream = np.zeros(bound + pad_extra, np.uint32)
    host_stream[:length] = np.asarray(padded[:length])
    stream_dev = jnp.asarray(host_stream)

    if on_tpu:
        # adaptive decode window: the header offset table bounds the
        # largest block, so decode skips DMA rows / select-matmul columns
        # the stream cannot touch (bit-exactness asserted below)
        win32 = codec_pallas.win_rows_for(
            codec_pallas.max_block_words(host_stream, shape, 32))
        dec = lambda s: codec_pallas._decode_fp32_device(s, shape, win32)
    else:
        dec = codec_xla.decode_fn(shape, 32)

    # correctness gate: bit-exact round trip + stream matches the oracle
    out = np.asarray(dec(stream_dev))
    assert np.array_equal(out.reshape(-1), data.view(np.uint32)), "round-trip failed"
    g_stream, g_len = golden.compress(data)
    assert g_len == length and host_stream[:length].tobytes() == g_stream.tobytes(), \
        "stream does not match the reference-format oracle"

    # --- two-point chained device timing ---
    def make_enc_loop(reps):
        @jax.jit
        def enc_loop(w):
            def body(i, acc):
                p, ln = enc(w ^ i.astype(jnp.uint32))
                return acc + ln + jax.lax.bitcast_convert_type(p[0], jnp.int32)
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
        return enc_loop

    def timed(loop, arg):
        int(loop(arg))  # warm-up / compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(arg))
            best = min(best, time.perf_counter() - t0)
        return best

    t_enc1 = timed(make_enc_loop(R1), words)
    t_enc2 = timed(make_enc_loop(R2), words)
    t_enc = (t_enc2 - t_enc1) / (R2 - R1)
    enc_gbps = nbytes / t_enc / 1e9

    # --- named decode configs: one shared helper does compress ->
    # adaptive window -> bit-exact assert -> two-point chained decode
    # timing; ratios use the profile word size.  Each config is fenced:
    # a failure records an error string instead of killing the artifact.
    extra = {}

    def bench_dec(shape_x, d_x):
        wb_x = 64 if d_x.dtype == np.float64 else 32
        if on_tpu:
            s_x, l_x = codec_pallas.compress(d_x)  # l_x in profile words
            win_x = codec_pallas.win_rows_for(
                codec_pallas.max_block_words(s_x, shape_x, wb_x))
            out_x = codec_pallas.decompress(s_x, shape_x, d_x.dtype, win=win_x)
        else:
            s_x, l_x = golden.compress(d_x)
            win_x = None
            out_x = codec_xla.decompress(s_x, shape_x, d_x.dtype)
        wdt = np.uint64 if wb_x == 64 else np.uint32
        assert np.array_equal(np.asarray(out_x).view(wdt), d_x.view(wdt)), \
            f"{shape_x} round-trip failed"
        if on_tpu:
            s_dev = jnp.asarray(codec_pallas._pad_for_decode(s_x, shape_x, wb_x))
        else:
            s_dev = jnp.asarray(s_x)

        def make_loop(reps):
            @jax.jit
            def loop(s):
                def body(i, carry):
                    s_, acc = carry
                    s_ = jax.lax.dynamic_update_slice(
                        s_, i.astype(jnp.uint32)[None], (s_.shape[0] - 1,))
                    if on_tpu and wb_x == 64:
                        w, _ = codec_pallas._decode_fp64_device(
                            s_, shape_x, win_x)
                    elif on_tpu:
                        w = codec_pallas._decode_fp32_device(s_, shape_x, win_x)
                    else:
                        w = codec_xla.decode_fn(shape_x, wb_x)(s_)
                    return s_, acc + jax.lax.bitcast_convert_type(
                        w.reshape(-1)[0].astype(jnp.uint32), jnp.int32)
                return jax.lax.fori_loop(0, reps, body, (s, jnp.int32(0)))[1]
            return loop

        t_a = timed(make_loop(R1), s_dev)
        t_b = timed(make_loop(R2), s_dev)
        t_x = (t_b - t_a) / (R2 - R1)
        return d_x.nbytes / t_x / 1e9, l_x * (wb_x // 8) / d_x.nbytes

    def fenced(key, fn):
        try:
            g, r = fn()
            extra[f"{key}_decompress_gbps"] = round(g, 3)
            extra[f"{key}_ratio"] = round(r, 4)
            return g
        except Exception as e:
            extra[f"{key}_error"] = f"{type(e).__name__}: {e}"[:300]
            return None

    # headline: fp32 1D 2^24 decode (BASELINE config 1)
    dec_gbps = fenced("fp32_1d", lambda: bench_dec(shape, data))
    if dec_gbps is None:
        dec_gbps = 0.0

    if on_tpu:
        def cfg_fp64():
            shape64 = (2**23,)
            d64 = (np.sin(np.arange(shape64[0], dtype=np.float64) * 1e-4)
                   + 0.001 * rng.standard_normal(shape64[0]))
            return bench_dec(shape64, d64)
        fenced("fp64", cfg_fp64)

        def cfg_cesm():
            shape2 = (1800, 3600)
            y = np.linspace(0, 11.0, shape2[0], dtype=np.float64)[:, None]
            x2 = np.linspace(0, 7.0, shape2[1], dtype=np.float64)[None, :]
            d2 = (np.sin(y) * np.cos(x2)
                  + 0.001 * rng.standard_normal(shape2)).astype(np.float32)
            return bench_dec(shape2, d2)
        fenced("cesm", cfg_cesm)

        def cfg_cube3d():
            shape3 = (256, 256, 256)
            zz = np.linspace(0, 5.0, 256, dtype=np.float64)
            d3 = (np.sin(zz[:, None, None]) * np.cos(zz[None, :, None])
                  * np.sin(zz[None, None, :] * 2)
                  + 0.001 * rng.standard_normal(shape3)).astype(np.float32)
            return bench_dec(shape3, d3)
        fenced("cube3d", cfg_cube3d)

    if on_tpu and os.environ.get("NDZIP_TPU_BENCH_FULL"):
        def cfg_fp64_512():
            shape5 = (512, 512, 512)  # BASELINE config 3: 1 GiB fp64 cube
            z5 = np.linspace(0, 9.0, 512)
            d5 = (np.sin(z5[:, None, None]) * np.cos(z5[None, :, None])
                  * np.sin(z5[None, None, :] * 2)
                  + 0.001 * rng.standard_normal(shape5))
            return bench_dec(shape5, d5)
        fenced("fp64_512cube", cfg_fp64_512)

        def cfg_big3d():
            # BASELINE config 4: batched multi-GB 3D fp32 (2 GiB working set)
            shape6 = (512, 512, 2048)
            z6 = np.linspace(0, 9.0, 512, dtype=np.float32)
            x6 = np.linspace(0, 4.0, 2048, dtype=np.float32)
            d6 = (np.sin(z6[:, None, None]) * np.cos(z6[None, :, None])
                  * np.sin(x6[None, None, :])).astype(np.float32)
            d6 += 0.001 * rng.standard_normal(shape6).astype(np.float32)
            return bench_dec(shape6, d6)
        fenced("fp32_2gib_3d", cfg_big3d)

    result = {
        "metric": "fp32 1D 2^24 decompression throughput (single chip, device time)",
        "value": round(dec_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(dec_gbps / PER_CHIP_BASELINE_GBPS, 3),
        "extra": {
            "compress_gbps": round(enc_gbps, 3),
            "ratio": round(length * 4 / nbytes, 4),
            "backend": backend,
            "reps": [R1, R2],
            "device": str(jax.devices()[0]),
            "multihost": ("functional-only on this hardware: single-chip "
                          "tunnel; DCN assembly exercised by "
                          "tests/test_multihost.py (BASELINE config 5)"),
            "mt_scaling": mt_scaling_probe(),
            **extra,
        },
    }
    return result


def main():
    try:
        ok, attempts = wait_for_tpu()
        if not ok:
            emit({
                "metric": "fp32 1D 2^24 decompression throughput (single chip, device time)",
                "value": None,
                "unit": "GB/s",
                "vs_baseline": None,
                "error": "tpu_backend_unavailable",
                "extra": {"tunnel_polls": attempts, **cpu_evidence()},
            })
            return 0
        result = run_tpu_bench()
        save_last(result)
        emit(result)
        return 0
    except Exception as e:
        tb = traceback.format_exc(limit=20)
        sys.stderr.write(tb)
        emit({
            "metric": "fp32 1D 2^24 decompression throughput (single chip, device time)",
            "value": None,
            "unit": "GB/s",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:300],
            "extra": cpu_evidence(),
        })
        return 0


if __name__ == "__main__":
    sys.exit(main())
