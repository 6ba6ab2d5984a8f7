"""Baker recipe end-to-end on a synthetic miniature corpus.

The reference's integration story IS its recipes (SURVEY §4): every
examples/*/run.sh is the supported path from raw corpus to deployed model.
This test fabricates a DataBaker-shaped corpus (ProsodyLabeling label pairs
+ sine Wave/*.wav) and drives examples/baker/run.sh stages 0-3 in a real
shell — lexicon generation, label parsing (incl. an erhua merge), table
derivation, shuf/awk/sed plumbing, a 2-step training run, batch inference
over the test split, and bundle export (reference run.sh:24-107).
"""

import json
import os
import subprocess

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (text-with-#k, syllables) templates; char count == syllable count except
# the erhua 儿 (merged into the previous syllable, prepare_data.py:60-74)
# equal phone-sequence lengths across templates -> inference hits ONE
# compiled bucket (wall-clock: each distinct padded shape is a fresh
# XLA:CPU compile); template 3 exercises the erhua merge
_TEMPLATES = [
    ("今天#1天气#2很好#4", "jin1 tian1 tian1 qi4 hen3 hao3"),
    ("我们#1一起#2公园#4", "wo3 men5 yi4 qi3 gong1 yuan2"),
    ("他在#1那边#2玩儿#4", "ta1 zai4 na4 bian1 wanr2"),
    ("小猫#1喜欢#2吃鱼#4", "xiao3 mao1 xi3 huan1 chi1 yu2"),
    ("明天#1可能#2下雨#4", "ming2 tian1 ke3 neng2 xia4 yu3"),
    ("欢迎#1使用#2语音#4", "huan1 ying2 shi3 yong4 yu3 yin1"),
]


def _make_corpus(root, n=36, sr=22050):
    wave_dir = root / "Wave"
    label_dir = root / "ProsodyLabeling"
    wave_dir.mkdir(parents=True)
    label_dir.mkdir(parents=True)
    from wetts_tpu.utils.wav import write_wav

    rng = np.random.default_rng(0)
    lines = []
    for i in range(1, n + 1):
        key = f"{i:06d}"
        text, syll = _TEMPLATES[(i - 1) % len(_TEMPLATES)]
        lines.append(f"{key}\t{text}\n\t{syll}\n")
        dur = float(rng.uniform(0.35, 0.6))
        t = np.arange(int(dur * sr)) / sr
        wav = (0.4 * np.sin(2 * np.pi * (120 + 5 * (i % 20)) * t)
               ).astype(np.float32)
        write_wav(str(wave_dir / f"{key}.wav"), wav, sr)
    (label_dir / "000001-010000.txt").write_text("".join(lines),
                                                 encoding="utf8")


def _tiny_config(path):
    cfg = {
        "train": {"segment_size": 1024, "batch_size": 2, "log_interval": 1,
                  "eval_interval": 1000, "epochs": 10000},
        "data": {"filter_length": 256, "hop_length": 64, "win_length": 256,
                 "sampling_rate": 22050, "n_mel_channels": 20},
        "model": {
            "inter_channels": 16, "hidden_channels": 16,
            "filter_channels": 32, "n_heads": 2, "n_layers": 1,
            "kernel_size": 3, "p_dropout": 0.1, "resblock": "2",
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [8, 8], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [16, 16], "gin_channels": 8,
        },
    }
    with open(path, "w") as f:
        json.dump(cfg, f)


@pytest.mark.slow
def test_baker_recipe_stages_0_to_3(tmp_path):
    _make_corpus(tmp_path)
    cfg_path = tmp_path / "tiny.json"
    _tiny_config(cfg_path)
    data = tmp_path / "data"
    exp = tmp_path / "exp"
    test_audio = tmp_path / "test_audio"

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        ["bash", "run.sh",
         "--stage", "0", "--stop_stage", "4",
         "--raw_data_dir", str(tmp_path),
         "--data", str(data), "--dir", str(exp),
         "--test_audio", str(test_audio),
         "--config", str(cfg_path),
         "--val_size", "8", "--test_size", "3",
         "--train_args", "--max_steps 2 --no_donate --plain_decoder"],
        cwd=os.path.join(_REPO, "examples", "baker"),
        env=env, capture_output=True, text=True, timeout=2400)
    tail = proc.stdout[-3000:] + proc.stderr[-3000:]
    assert proc.returncode == 0, f"recipe failed:\n{tail}"

    # stage 0: manifest + tables (36 utts -> 8 val / 3 test / 25 train)
    all_lines = open(data / "all.txt", encoding="utf8").read().splitlines()
    assert len(all_lines) == 36
    assert all("|baker|sil " in line for line in all_lines)
    # the erhua template merged 儿 (no own syllable, marker moved)
    erhua = [ln for ln in all_lines if "000003" in ln][0]
    assert "#4" in erhua
    assert len(open(data / "train.txt").read().splitlines()) == 25
    assert len(open(data / "test.txt").read().splitlines()) == 3
    phones = open(data / "phones.txt").read().splitlines()
    assert phones[0] == "sil 0" and len(phones) > 20

    # stage 1: 2 training steps + checkpoint
    metrics = [json.loads(line)
               for line in open(exp / "metrics.jsonl")]
    assert metrics and np.isfinite(metrics[-1]["loss/g_total"])
    # Trainer writes Orbax step dirs directly under the run dir
    assert any(d.isdigit() for d in os.listdir(exp)), os.listdir(exp)

    # stage 2: synthesized the test utterances
    wavs = [f for f in os.listdir(test_audio) if f.endswith(".wav")]
    assert len(wavs) == 3
    assert all(os.path.getsize(test_audio / w) > 1000 for w in wavs)

    # stage 3: exported bundle is loadable by the CLI Model
    from wetts_tpu.cli.model import Model

    bundle = exp / "bundle"
    model = Model(str(bundle))
    audio = model.synthesis("sil j in1 t ian1 #4", "baker")
    assert audio.size > 0

    # stage 4: the MCD quality gate ran over the test split (a 2-step
    # model scores badly, but the number must exist and be finite)
    mcd = json.loads(open(exp / "mcd.json").read())
    assert mcd["metric"] == "mel_cepstral_distortion_db"
    assert mcd["n_pairs"] == 3
    assert np.isfinite(mcd["mean"])
