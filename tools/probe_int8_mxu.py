"""Feasibility probe: does a Pallas int8 x int8 -> int32 dot reach the
2x int8 MXU peak on this chip?

XLA's conv_general_dilated with int8 operands measured throughput-NEUTRAL
vs bf16 on v5e (round 4: 563 vs 557 audio-s/s) — it lowers onto the bf16
MXU pipeline. This times a bare Pallas matmul CHAIN (16 dependent
[512,1024]x[1024,1024] dots per tile, so compute dwarfs the ~1.5 ms
dispatch floor measured through the tunnel) in bf16 vs int8, with the
int8 chain requantizing between hops exactly like a quantized conv stack
would. Prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wetts_tpu.utils.sync import hard_block

M, K = 8192, 1024
TM = 512
CHAIN = 16


def _chain(x, w, dtype):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        if dtype == jnp.int8:
            def body(_, a):
                y = jnp.dot(a, b, preferred_element_type=jnp.int32)
                # requantize: >>10 keeps values in int8 range (operands
                # are <=127; sum of 1024 products needs ~17 bits)
                return jnp.clip(y >> 10, -127, 127).astype(jnp.int8)
        else:
            def body(_, a):
                y = jnp.dot(a, b, preferred_element_type=jnp.float32)
                return (y * (1.0 / 32.0)).astype(jnp.bfloat16)

        o_ref[:] = jax.lax.fori_loop(0, CHAIN, body, a)

    return pl.pallas_call(
        kernel,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), dtype),
    )(x, w)


def time_one(dtype, iters=10):
    rng = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(rng, (M, K), -127, 127, jnp.int8)
        w = jax.random.randint(rng, (K, K), -127, 127, jnp.int8)
    else:
        x = jax.random.normal(rng, (M, K), dtype)
        w = jax.random.normal(rng, (K, K), dtype)
    f = jax.jit(functools.partial(_chain, dtype=dtype))
    c = f.lower(x, w).compile()
    hard_block(c(x, w))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = c(x, w)
        hard_block(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    tops = 2 * M * K * K * CHAIN / best / 1e12
    return round(best * 1e3, 3), round(tops, 1)


def main():
    out = {"shape": [M, K, K], "chain": CHAIN,
           "device": jax.devices()[0].device_kind}
    ms, tops = time_one(jnp.bfloat16)
    out["bf16_ms"], out["bf16_tflops"] = ms, tops
    try:
        ms, tops = time_one(jnp.int8)
        out["int8_ms"], out["int8_tops"] = ms, tops
        out["int8_speedup"] = round(out["bf16_ms"] / ms, 2)
    except Exception as e:  # noqa: BLE001 - probe records failures
        out["int8_error"] = f"{type(e).__name__}: {e}"[:500]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
