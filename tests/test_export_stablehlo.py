"""StableHLO export roundtrip: the serialized graphs must reproduce the
in-framework outputs after deserialization, with weights baked in (the
ONNX-export analog, reference export_onnx.py:54-189)."""

import numpy as np
import jax
import jax.numpy as jnp

from wetts_tpu.config import Config
from wetts_tpu.models.synthesizer import Synthesizer
from wetts_tpu.bin.export_stablehlo import export_graphs


def tiny_cfg():
    return Config.from_dict({
        "train": {"segment_size": 256},
        "data": {"filter_length": 64, "hop_length": 16, "win_length": 64},
        "model": {
            "inter_channels": 16, "hidden_channels": 16,
            "filter_channels": 32, "n_heads": 2, "n_layers": 1,
            "kernel_size": 3, "p_dropout": 0.1, "resblock": "2",
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [4, 4], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [8, 8], "gin_channels": 8,
        },
        "num_phones": 16, "num_speakers": 2})


def test_stablehlo_roundtrip(tmp_path):
    from jax import export as jexport

    cfg = tiny_cfg()
    model = Synthesizer.from_config(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8), jnp.int32)
    xl = jnp.full((1,), 8, jnp.int32)
    spec = jnp.zeros((1, 36, cfg.data.spec_channels))
    yl = jnp.full((1,), 36, jnp.int32)
    sid = jnp.zeros((1,), jnp.int32)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng, "slice": rng},
        x, xl, spec, yl, sid)

    graphs = export_graphs(cfg, variables, text_buckets=[8],
                           frame_buckets=[48])
    assert set(graphs) == {"encoder_t8", "decoder_f48"}

    # serialize -> bytes -> deserialize: the consumer needs no model code
    enc = jexport.deserialize(graphs["encoder_t8"][0])
    dec = jexport.deserialize(graphs["decoder_f48"][0])

    z, y_len = enc.call(x, xl, sid, jnp.int32(7))
    assert z.shape == (1, 8 * 12, cfg.model.inter_channels)
    # reference output from the live model, same seed
    z_ref, y_len_ref, *_ = model.apply(
        variables, x, xl, sid, 0.667, 1.0, 0.8, 8 * 12,
        method=Synthesizer.encode_infer,
        rngs={"noise": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(y_len), np.asarray(y_len_ref))

    audio = dec.call(z[:, :48], sid)
    audio_ref = model.apply(variables, z_ref[:, :48], None, sid,
                            method=Synthesizer.decode)
    assert audio.shape == (1, 48 * 16, 1)
    np.testing.assert_allclose(np.asarray(audio), np.asarray(audio_ref),
                               rtol=1e-5, atol=1e-5)
