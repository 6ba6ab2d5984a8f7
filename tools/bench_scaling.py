"""Virtual-mesh scaling overhead of the GAN train step (SURVEY §2.7).

Multi-chip hardware is not reachable from this host, so true inter-chip
scaling cannot be measured; what CAN be measured on the virtual CPU mesh
is the *sharding overhead*: the same total arithmetic (global batch B)
executed (a) on one device and (b) sharded over 8 virtual devices with
the real in/out shardings and the XLA-inserted gradient psums. Virtual
devices share the host's cores, so equal-work wall times mean the
sharded program added no overhead beyond the math — the collectives,
replication layout, and partitioned graphs are free.

    efficiency = t_single(B) / t_mesh_8dev(B)   (1.0 = no overhead)

Caveats (also recorded in the output): XLA:CPU parallelizes a single
device across cores differently from 8 virtual devices, and a real TPU
pod pays ICI latency this cannot see. The number bounds the *software*
overhead of the sharded program, not the hardware's.

Modes:
  --n_devices N --batch B    one timed config; prints one JSON line
  --compare                  subprocess itself for (1, B) and (8, B) and
                             print the combined line (device count must be
                             fixed before backend init, hence processes)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(n_devices: int, batch: int, iters: int) -> dict:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # mesh-sharded+donated executables crash jaxlib 0.9.0's persistent
    # cache on XLA:CPU (see __graft_entry__.dryrun_multichip)
    jax.config.update("jax_compilation_cache_dir", None)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _dryrun_config
    from wetts_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from wetts_tpu.train.state import make_optimizer
    from wetts_tpu.train.step import build_models, init_state, \
        make_train_step

    cfg = _dryrun_config()
    cfg.model.use_duration_discriminator = True
    net_g, net_d, net_dur_d, _ = build_models(cfg)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, rng, net_g, net_d, net_dur_d, tx)
    train_step = make_train_step(cfg, net_g, net_d, net_dur_d, tx,
                                 use_fast_decoder=False)
    mesh = make_mesh(n_devices)
    state = replicate(mesh, state)
    t_spec = cfg.train.segment_size // cfg.data.hop_length + 8
    batch_d = {
        "phone_ids": jnp.ones((batch, 16), jnp.int32),
        "text_lengths": jnp.full((batch,), 16, jnp.int32),
        "wav": jnp.zeros((batch, t_spec * cfg.data.hop_length), jnp.float32),
        "spec_lengths": jnp.full((batch,), t_spec, jnp.int32),
        "sid": jnp.zeros((batch,), jnp.int32),
    }
    batch_d = shard_batch(mesh, batch_d)
    repl = NamedSharding(mesh, P())
    step = jax.jit(
        train_step,
        in_shardings=(repl, NamedSharding(mesh, P("data")), repl),
        out_shardings=(repl, repl),
    )
    t0 = time.perf_counter()
    state, metrics = step(state, batch_d, rng)
    jax.block_until_ready(state.params_g)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch_d, rng)
        jax.block_until_ready(state.params_g)
        best = min(best, (time.perf_counter() - t0) / iters)
    return {"n_devices": n_devices, "global_batch": batch,
            "step_s": round(best, 4), "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--compare", action="store_true")
    args = ap.parse_args()
    if not args.compare:
        print(json.dumps(run_one(args.n_devices, args.batch, args.iters)))
        return
    results = {}
    for n in (1, 8):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # device count must be per-process
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--n_devices", str(n), "--batch", str(args.batch),
             "--iters", str(args.iters)],
            capture_output=True, text=True, env=env, timeout=3600)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        if proc.returncode != 0 or not line:
            raise SystemExit(
                f"n={n} failed: {proc.stderr[-2000:]}")
        results[n] = json.loads(line)
    eff = results[1]["step_s"] / results[8]["step_s"]
    print(json.dumps({
        "metric": "virtual_mesh_sharding_efficiency",
        "global_batch": args.batch,
        "single_device": results[1],
        "mesh_8dev": results[8],
        "efficiency": round(eff, 3),
        "note": ("equal total arithmetic on shared host cores; 1.0 means "
                 "the sharded program (psums, partitioned graphs, "
                 "replicated params) adds no overhead beyond the math. "
                 "Software-overhead bound only — real ICI latency is not "
                 "visible on a virtual mesh."),
    }))


if __name__ == "__main__":
    main()
