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
B, T, F = 8, 128, 800
x = jax.random.randint(rng, (B, T), 0, 256); xl = jnp.full((B,), T, jnp.int32)
sid = jnp.zeros((B,), jnp.int32)
spec = jnp.zeros((2, 64, cfg.data.spec_channels))
variables = model.init({"params": rng, "noise": rng, "dropout": rng, "slice": rng},
                       x[:2], xl[:2], spec, jnp.full((2,),64,jnp.int32), sid[:2])

def bench(name, vars_, xx, xxl, ss, iters=10):
    @jax.jit
    def synth(x, xl, sid, key):
        a, yl, _ = model.apply(vars_, x, xl, sid, 0.667, 1.0, 0.8, F,
                               method=Synthesizer.infer, rngs={"noise": key})
        return a, yl
    a, _ = synth(xx, xxl, ss, jax.random.PRNGKey(1)); jax.block_until_ready(a)
    t0 = time.perf_counter()
    for i in range(iters):
        a, yl = synth(xx, xxl, ss, jax.random.PRNGKey(i))
    jax.block_until_ready(a)
    dt = time.perf_counter() - t0
    bsz = xx.shape[0]
    audio_s = iters * bsz * F * 256 / 22050
    print(f"{name}: {audio_s/dt:.0f} audio-s/s  (finite={bool(jnp.isfinite(a.astype(jnp.float32)).all())})", flush=True)
    return a

a32 = bench("fp32 B=8", variables, x, xl, sid)
x16 = jnp.concatenate([x, x]); xl16 = jnp.concatenate([xl, xl]); sid16 = jnp.concatenate([sid, sid])
bench("fp32 B=16", variables, x16, xl16, sid16)
vb = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, variables)
abf = bench("bf16 B=8", vb, x, xl, sid)
print("bf16 vs fp32 max-abs-diff:", float(jnp.abs(abf.astype(jnp.float32) - a32).max()))
