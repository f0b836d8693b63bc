"""Minimal repro for the round-4 toolchain regression: Mosaic rejects
i8->i1 trunci on unaligned bool-vector selects (jnp.where with boolean
operands at (265,128)).  Run on the live tunnel to confirm which forms
compile; the passing form is the rewrite rule for codec_pallas."""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

R, LANES = 265, 128


def kern_bool_where(x_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    fill = x_ref[0, 0].astype(jnp.int32)
    x = x_ref[:]
    valid = jnp.where(rows == 0, cols < fill,
                      ((rows % 33 == 1) | (x != 0)) & (rows < 200)
                      ).astype(jnp.int32)
    o_ref[:] = valid


def kern_int_where(x_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    fill = x_ref[0, 0].astype(jnp.int32)
    x = x_ref[:]
    valid = jnp.where(rows == 0,
                      (cols < fill).astype(jnp.int32),
                      (((rows % 33 == 1) | (x != 0)) & (rows < 200)
                       ).astype(jnp.int32))
    o_ref[:] = valid


def run(kern, name):
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int32),
    )
    x = jnp.ones((R, LANES), jnp.uint32)
    try:
        out = jax.jit(f)(x)
        out.block_until_ready()
        print(name, "OK", int(out.sum()))
    except Exception as e:
        print(name, "FAIL:", str(e).splitlines()[0][:160])


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("bool", "both"):
        run(kern_bool_where, "bool_where")
    if which in ("int", "both"):
        run(kern_int_where, "int_where")
