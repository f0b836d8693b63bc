"""Unit tests for the flat-vector kernel primitives (ops/flatvec.py) and
the kernel-side layout helpers (codec_pallas) under CPU jax semantics —
the analog of the reference's pure-function unit tests
(codec_generic_test.cc:13-157)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndzip_tpu import codec_pallas as cp
from ndzip_tpu.ops import flatvec as fv

RNG = np.random.default_rng(2)


@pytest.fixture(autouse=True)
def eager_roll(monkeypatch):
    """pltpu.roll has no eager evaluation rule outside Pallas; jnp.roll has
    identical semantics (out[i] = x[(i - shift) % n])."""
    monkeypatch.setattr(fv, "_roll", lambda x, s, a: jnp.roll(x, s, a))
    monkeypatch.setattr(
        cp.pltpu, "roll",
        lambda x, shift, axis: jnp.roll(x, shift, axis))


def _flat(x):
    return np.asarray(x).reshape(-1)


class TestShifts:
    @pytest.mark.parametrize("k", [1, 2, 16, 64, 128, 256])
    def test_shift_left_right(self, k):
        x = jnp.asarray(RNG.integers(0, 2**31, (5, 128), dtype=np.int32))
        ref = np.zeros(5 * 128, np.int32)
        ref[: 5 * 128 - k] = _flat(x)[k:]
        assert np.array_equal(_flat(fv.shift_flat_left(x, k)), ref)
        ref2 = np.zeros(5 * 128, np.int32)
        ref2[k:] = _flat(x)[: 5 * 128 - k]
        assert np.array_equal(_flat(fv.shift_flat_right(x, k)), ref2)


class TestScans:
    def test_flat_cumsum(self):
        x = jnp.asarray(RNG.integers(0, 2, (7, 128), dtype=np.int32))
        assert np.array_equal(_flat(fv.flat_cumsum(x)), np.cumsum(_flat(x)))

    def test_lane_count_prefix_matches_lane_cumsum(self):
        x = jnp.asarray(RNG.integers(0, 2, (3, 9, 128), dtype=np.int32))
        a = np.asarray(fv.lane_count_prefix(x))
        b = np.asarray(fv.lane_cumsum(x))
        assert np.array_equal(a, b)

    @pytest.mark.parametrize("stride,seg", [(1, 4096), (1, 64), (64, 4096),
                                            (16, 256), (1, 16), (256, 4096)])
    def test_segmented_cumsum_inverts_diff(self, stride, seg):
        x = jnp.asarray(RNG.integers(0, 2**32, (32, 128), dtype=np.uint32))
        d = fv.segmented_diff_flat(x, stride, seg)
        back = fv.segmented_cumsum_flat(d, stride, seg)
        assert np.array_equal(np.asarray(back), np.asarray(x))

    @pytest.mark.parametrize("stride,seg", [(1, 4096), (16, 256), (256, 4096)])
    def test_segmented_pair_inverts(self, stride, seg):
        lo = jnp.asarray(RNG.integers(0, 2**32, (32, 128), dtype=np.uint32))
        hi = jnp.asarray(RNG.integers(0, 2**32, (32, 128), dtype=np.uint32))
        dlo, dhi = fv.segmented_diff_flat_pair(lo, hi, stride, seg)
        blo, bhi = fv.segmented_cumsum_flat_pair(dlo, dhi, stride, seg)
        assert np.array_equal(np.asarray(blo), np.asarray(lo))
        assert np.array_equal(np.asarray(bhi), np.asarray(hi))


class TestRouting:
    @pytest.mark.parametrize("density", [0.0, 0.3, 1.0])
    def test_compact_rows_left_compacts(self, density):
        valid = (RNG.random((9, 128)) < density).astype(np.int32)
        vals = RNG.integers(1, 2**32, (9, 128), dtype=np.uint32)
        cs = np.cumsum(valid, axis=1)
        cols = np.broadcast_to(np.arange(128), (9, 128))
        s = np.where(valid != 0, cols + 1 - cs, -1).astype(np.int32)
        (comp,), _ = fv.compact_rows((jnp.asarray(vals),), jnp.asarray(s))
        comp = np.asarray(comp)
        for r in range(9):
            expect = vals[r][valid[r].astype(bool)]
            assert np.array_equal(comp[r, : expect.size], expect), r

    @pytest.mark.parametrize("n_rows,density", [(37, 0.5), (265, 0.97),
                                                (265, 0.05), (64, 1.0)])
    def test_rowwise_compact_and_merge(self, n_rows, density):
        """The encode kernel's two-phase compaction (in-row butterfly +
        rotation gather + OR-merge over rows) equals flat compaction."""
        vals = RNG.integers(1, 2**32, (n_rows, 128), dtype=np.uint32)
        valid = (RNG.random((n_rows, 128)) < density).astype(np.int32)
        expect = vals.reshape(-1)[valid.reshape(-1).astype(bool)]

        lane_cs = np.asarray(fv.lane_count_prefix(jnp.asarray(valid)))
        cnt = np.broadcast_to(lane_cs[:, 127:], (n_rows, 128))
        off = np.broadcast_to(
            np.concatenate([[0], np.cumsum(cnt[:-1, 0])])[:, None],
            (n_rows, 128)).astype(np.int32)
        cols = np.broadcast_to(np.arange(128), (n_rows, 128))
        rows = np.broadcast_to(np.arange(n_rows)[:, None], (n_rows, 128))

        rot = off & 127
        prow = off >> 7
        j = (cols - rot) & 127
        can = j < cnt
        s_local = np.where(valid != 0, cols + 1 - lane_cs, -1)
        (comp,), _ = fv.compact_rows(
            (jnp.asarray(vals),), jnp.asarray(s_local.astype(np.int32)))
        part = np.where(can, np.take_along_axis(np.asarray(comp), j, axis=1), 0)
        s_merge = np.where(can, rows - prow - (cols < rot), -1)
        # co-routed plane pair exercises the tuple path (fp64 kernels)
        m, m2 = fv.merge_rows_or(
            (jnp.asarray(part.astype(np.uint32)), jnp.asarray(~part.astype(np.uint32))),
            jnp.asarray(s_merge.astype(np.int32)))
        out = np.asarray(m).reshape(-1)[: expect.size]
        assert np.array_equal(out, expect)
        assert np.array_equal(np.asarray(m2).reshape(-1)[: expect.size], ~expect)

        # round-gated variant: (n_rows-1) - prow[-1] bounds every live
        # shift (the encode kernels' bound), so results must be identical
        ms = jnp.int32(n_rows - 1 - prow[-1, 0])
        (g,) = fv.merge_rows_or((jnp.asarray(part.astype(np.uint32)),),
                                jnp.asarray(s_merge.astype(np.int32)), ms)
        assert np.array_equal(np.asarray(g).reshape(-1)[: expect.size], expect)


class TestLayoutHelpers:
    def test_interleave_deinterleave_round_trip(self):
        lo = RNG.integers(0, 2**32, (6, 128), dtype=np.uint32)
        hi = RNG.integers(0, 2**32, (6, 128), dtype=np.uint32)
        inter = cp.interleave_planes_rows(jnp.asarray(lo), jnp.asarray(hi))
        # stream order: u32 index 2w+p of u64 word w
        expect = np.stack([lo.reshape(-1), hi.reshape(-1)], axis=-1).reshape(-1)
        assert np.array_equal(_flat(inter), expect)
        back_lo, back_hi = cp.deinterleave_window_rows(
            jnp.asarray(np.asarray(inter).reshape(1, 12, 128)))
        assert np.array_equal(np.asarray(back_lo)[0], lo)
        assert np.array_equal(np.asarray(back_hi)[0], hi)

    def test_transpose_bits_lane32_involution(self):
        x = jnp.asarray(RNG.integers(0, 2**32, (2, 4, 128), dtype=np.uint32))
        t = cp.transpose_bits_lane32(x)
        tt = cp.transpose_bits_lane32(t)
        assert np.array_equal(np.asarray(tt), np.asarray(x))

    def test_transpose_pair_lane64_involution(self):
        lo = jnp.asarray(RNG.integers(0, 2**32, (2, 4, 128), dtype=np.uint32))
        hi = jnp.asarray(RNG.integers(0, 2**32, (2, 4, 128), dtype=np.uint32))
        l2, h2 = cp.transpose_bits_lane64_pair(lo, hi)
        l3, h3 = cp.transpose_bits_lane64_pair(l2, h2)
        assert np.array_equal(np.asarray(l3), np.asarray(lo))
        assert np.array_equal(np.asarray(h3), np.asarray(hi))

    @pytest.mark.parametrize("G", [8, 16])
    def test_tile3d_butterfly_matches_gather(self, G):
        """The XOR cell-swap butterfly adapters are bit-identical to the
        lane-gather adapters (both directions, round trip)."""
        tile = jnp.asarray(
            RNG.integers(0, 2**32, (16, 16, G * 16), dtype=np.uint32))
        blocks = jnp.asarray(
            RNG.integers(0, 2**32, (G, 32, 128), dtype=np.uint32))
        assert np.array_equal(np.asarray(cp.tile_to_blocks_3d_bfly(tile, G)),
                              np.asarray(cp.tile_to_blocks_3d(tile, G)))
        assert np.array_equal(np.asarray(cp.blocks_to_tile_3d_bfly(blocks, G)),
                              np.asarray(cp.blocks_to_tile_3d(blocks, G)))
        rt = cp.blocks_to_tile_3d_bfly(cp.tile_to_blocks_3d_bfly(tile, G), G)
        assert np.array_equal(np.asarray(rt), np.asarray(tile))

    @pytest.mark.parametrize("G", [2, 8, 16])
    def test_tile2d_butterfly_matches_gather(self, G):
        tile = jnp.asarray(
            RNG.integers(0, 2**32, (64, G * 64), dtype=np.uint32))
        blocks = jnp.asarray(
            RNG.integers(0, 2**32, (G, 32, 128), dtype=np.uint32))
        assert np.array_equal(np.asarray(cp.tile_to_blocks_2d_bfly(tile, G)),
                              np.asarray(cp.tile_to_blocks_2d(tile, G)))
        assert np.array_equal(np.asarray(cp.blocks_to_tile_2d_bfly(blocks, G)),
                              np.asarray(cp.blocks_to_tile_2d(blocks, G)))

    def test_head_row_gather_and_spread(self):
        # h1: heads of chunks 4r..4r+3 at lanes 0..3 of row r -> lane c of
        # the head row
        h1 = np.zeros((1, 32, 128), np.uint32)
        for c in range(128):
            h1[0, c // 4, c % 4] = c + 1
        row = np.asarray(cp.head_row_from_h1(jnp.asarray(h1)))
        assert np.array_equal(row[0, 0], np.arange(1, 129, dtype=np.uint32))
        spread = np.asarray(cp.head_spread_to_flat(jnp.asarray(row), 1))
        for c in range(128):
            seg = spread[0].reshape(-1)[32 * c : 32 * c + 32]
            assert (seg == c + 1).all()

    def test_select_window_rows_exact_u32(self):
        """One-hot row selection must be bit-exact for arbitrary u32
        payloads (u8-quarter bf16 matmuls with exact byte products)."""
        G, R_out, W = 2, 64, 34
        w = jnp.asarray(RNG.integers(0, 2**32, (G, W, 128), dtype=np.uint32))
        rows = RNG.integers(0, W, (G, R_out))
        q = np.arange(W)
        P = (q[None, None, :] == rows[:, :, None]).astype(np.float32)
        out = np.asarray(cp._select_window_rows(jnp.asarray(P), w))
        expect = np.asarray(w)[np.arange(G)[:, None], rows, :]
        assert np.array_equal(out, expect)

    def test_padded_block_ids_and_layout(self):
        # CESM-like 2D: 56 block columns padded to 2 tiles of 32 (ask for
        # the peak batch explicitly; the library default is smaller)
        shape = (1800, 3600)
        tc = cp._g_tiled_padded(shape, 2, 32)
        assert tc == (32, 2)
        ids = cp._padded_block_ids(shape, 2, *tc)
        bs, imap, nb = cp._tiled_layout_padded(shape, 2, *tc)
        assert bs == (64, 32 * 64) and nb == 28 * 64 == ids.size
        # real ids row-major; fake slots clamp to the row's last block
        assert ids[0] == 0 and ids[55] == 55 and ids[56] == 55 and ids[63] == 55
        assert ids[64] == 56 and ids[64 + 57] == 111
        assert imap(0) == (0, 0) and imap(1) == (0, 1) and imap(2) == (1, 0)
        # exact divisor degenerates to the unpadded case
        assert cp._g_tiled_padded((256, 256, 256), 3, 32) == (16, 1)
        assert cp._g_tiled_padded((2**20,), 1, 32) is None

    def test_g_policy_prefers_exact_tiling_above_largest(self):
        """With exact_cap, the decode G policy picks a zero-fake-block
        EXACT minor-axis tiling above the configured batch knob when its
        modeled cost wins (measured 44.1 vs 36.6 GB/s on CESM,
        dev/cesm_g_probe.py)."""
        shape = (1800, 3600)  # grid 28x56
        assert cp._g_tiled_padded(shape, 2, 16, exact_cap=56) == (56, 1)
        assert cp._g_tiled_padded(shape, 2, 32, exact_cap=56) == (56, 1)
        # above `largest` only exact tilings qualify: gm=26 has no
        # multiple-of-8 divisor, every padded option exceeds max_pad
        assert cp._g_tiled_padded((128, 64 * 26), 2, 8, exact_cap=56) is None
        # a large-G padded candidate within `largest` still loses to a
        # slightly smaller exact one on the cost model (gm=40, pad 20%)
        assert cp._g_tiled_padded((128, 64 * 40), 2, 48) == (40, 1)
        # 1D and fp64-default behavior unchanged by the cap default
        assert cp._g_tiled_padded((512, 512, 512), 3, 16) == (16, 2)

    def test_heads_via_matmul_matches_or(self):
        body = RNG.integers(0, 2**32, (2, 32, 128), dtype=np.uint32)
        body[body % 3 == 0] = 0  # plenty of zero words
        h1 = np.asarray(cp.heads_via_matmul(jnp.asarray(body)))
        for g in range(2):
            for r in range(32):
                for s in range(4):
                    nz = body[g, r, 32 * s : 32 * s + 32] != 0
                    expect = np.uint32(0)
                    for i, bit in enumerate(nz):
                        if bit:
                            expect |= np.uint32(1) << np.uint32(31 - i)
                    assert h1[g, r, s] == expect, (g, r, s)
