import time, numpy as np, jax, jax.numpy as jnp
from wetts_tpu.config import Config
from wetts_tpu.models.synthesizer import Synthesizer

cfg = Config.from_dict({
    "train": {"segment_size": 8192},
    "data": {"filter_length": 1024, "hop_length": 256, "win_length": 1024,
             "sampling_rate": 22050},
    "model": {"inter_channels": 192, "hidden_channels": 192,
        "filter_channels": 768, "n_heads": 2, "n_layers": 6,
        "kernel_size": 3, "p_dropout": 0.1, "resblock": "1",
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "upsample_rates": [8, 8, 2, 2], "upsample_initial_channel": 512,
        "upsample_kernel_sizes": [16, 16, 4, 4], "gin_channels": 256},
    "num_phones": 256, "num_speakers": 8})
model = Synthesizer.from_config(cfg)
rng = jax.random.PRNGKey(0)
T, F = 128, 800
x2 = jax.random.randint(rng, (2, T), 0, 256)
spec = jnp.zeros((2, 64, cfg.data.spec_channels))
variables = model.init({"params": rng, "noise": rng, "dropout": rng, "slice": rng},
                       x2, jnp.full((2,), T, jnp.int32), spec,
                       jnp.full((2,), 64, jnp.int32), jnp.zeros((2,), jnp.int32))
vb = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, variables)

def bench(name, vars_, B, iters=10):
    x = jax.random.randint(rng, (B, T), 0, 256)
    xl = jnp.full((B,), T, jnp.int32); sid = jnp.zeros((B,), jnp.int32)
    @jax.jit
    def synth(x, xl, sid, key):
        a, yl, _ = model.apply(vars_, x, xl, sid, 0.667, 1.0, 0.8, F,
                               method=Synthesizer.infer, rngs={"noise": key})
        return a
    a = synth(x, xl, sid, jax.random.PRNGKey(1)); jax.block_until_ready(a)
    t0 = time.perf_counter()
    for i in range(iters):
        a = synth(x, xl, sid, jax.random.PRNGKey(i))
    jax.block_until_ready(a)
    dt = time.perf_counter() - t0
    print(f"{name}: {iters*B*F*256/22050/dt:.0f} audio-s/s", flush=True)

bench("fp32 B=32", variables, 32)
bench("bf16 B=16", vb, 16)
bench("bf16 B=32", vb, 32)
