"""Full-reference-size conversion parity (slow).

The strongest available proxy for loading the released multilingual_vits_v3
checkpoint while egress is unavailable: build the torch oracle at the
production configuration (hidden 192 / filter 768 / 6 layers / upsample
8*8*2*2, multi-speaker — examples/baker/configs/v1.json:31-39), convert the
randomly-initialized state_dict, and assert end-to-end infer parity. A toy
size (hidden 32, 2 layers) can hide mapping bugs that only full-depth,
full-width trees expose (e.g. wrong layer counts, missed cond layers).
"""

import numpy as np
import pytest

from test_torch_parity import build_pair, infer_pair


def fullsize_cfg(**model_overrides):
    model = {
        "inter_channels": 192, "hidden_channels": 192,
        "filter_channels": 768, "n_heads": 2, "n_layers": 6,
        "kernel_size": 3, "p_dropout": 0.1, "resblock": "1",
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "upsample_rates": [8, 8, 2, 2], "upsample_initial_channel": 512,
        "upsample_kernel_sizes": [16, 16, 4, 4], "gin_channels": 256,
    }
    model.update(model_overrides)
    from wetts_tpu.config import Config

    return Config.from_dict({
        "train": {"segment_size": 8192},
        "data": {"filter_length": 1024, "hop_length": 256,
                 "win_length": 1024, "sampling_rate": 22050},
        "model": model, "num_phones": 128, "num_speakers": 8})


@pytest.mark.slow
@pytest.mark.parametrize("overrides", [
    {},  # VITS1 + SDP multi-speaker: the v1.json/multilingual_vits_v3 shape
    # VITS2 flagship flow type at full size
    {"use_transformer_flows": True,
     "transformer_flow_type": "mono_layer_post_residual"},
    # published-baseline vocos decoder at full size (vits2_vocos_v1.json)
    {"vocoder_type": "vocos", "vocos_channels": 512,
     "vocos_h_channels": 1536, "vocos_out_channels": 1026,
     "vocos_num_layers": 8,
     "vocos_istft_config": {"n_fft": 1024, "hop_length": 256,
                            "win_length": 1024}},
])
def test_fullsize_infer_parity(overrides):
    cfg = fullsize_cfg(**overrides)
    tmodel, jmodel, variables = build_pair(cfg)
    t_audio, t_y_mask, j_audio, j_ylen = infer_pair(
        cfg, tmodel, jmodel, variables)
    t_lens = t_y_mask.sum(axis=(1, 2)).astype(int)
    np.testing.assert_array_equal(j_ylen, t_lens)
    hop = int(np.prod(cfg.model.upsample_rates))
    for i in range(t_audio.shape[0]):
        n = t_lens[i] * hop
        np.testing.assert_allclose(
            j_audio[i, :n, 0], t_audio[i, 0, :n], atol=5e-4,
            err_msg=f"utt {i} ({overrides})")
