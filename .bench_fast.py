# Compare decoder-only: standard vs space-to-depth fast path, fp32/bf16.
import time, numpy as np, jax, jax.numpy as jnp
from wetts_tpu.models.hifigan import Generator
from wetts_tpu.models.hifigan_fast import fast_generator_apply

kw = dict(initial_channel=192, resblock="1",
          resblock_kernel_sizes=(3, 7, 11),
          resblock_dilation_sizes=((1, 3, 5),) * 3,
          upsample_rates=(8, 8, 2, 2), upsample_initial_channel=512,
          upsample_kernel_sizes=(16, 16, 4, 4))
g = Generator(gin_channels=256, **kw)
rng = np.random.default_rng(0)
B, F = 8, 800
x = jnp.asarray(rng.standard_normal((B, F, 192)).astype(np.float32))
spk = jnp.asarray(rng.standard_normal((B, 1, 256)).astype(np.float32))
params = g.init({"params": jax.random.PRNGKey(0)}, x[:1, :8], spk[:1])

def run(name, fn, xx, iters=10):
    a = fn(xx); jax.block_until_ready(a)
    t0 = time.perf_counter()
    for _ in range(iters):
        a = fn(xx)
    jax.block_until_ready(a)
    dt = time.perf_counter() - t0
    audio_s = iters * B * F * 256 / 22050
    print(f"{name}: {audio_s/dt:.0f} audio-s/s", flush=True)
    return a

std = jax.jit(lambda xx: g.apply(params, xx, spk))
fast = jax.jit(lambda xx: fast_generator_apply(params["params"], xx, spk, **kw))
a1 = run("decoder std fp32", std, x)
a2 = run("decoder fast fp32", fast, x)
print("max diff:", float(jnp.abs(a1 - a2).max()), flush=True)

pb = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
xb = x.astype(jnp.bfloat16); spkb = spk.astype(jnp.bfloat16)
stdb = jax.jit(lambda xx: g.apply(pb, xx, spkb))
fastb = jax.jit(lambda xx: fast_generator_apply(pb["params"], xx, spkb, **kw))
run("decoder std bf16", stdb, xb)
run("decoder fast bf16", fastb, xb)
