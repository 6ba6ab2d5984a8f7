"""Smoke tests for the native serving binaries (tts_main, http_server_main).

These binaries embed CPython to drive the XLA engine
(native/src/embed_engine.cc); parity targets are
runtime/core/bin/tts_main.cc and runtime/core/http/http_server_main.cc.
Skipped when the binaries haven't been built (ci.sh builds them).
"""

import base64
import json
import os
import signal
import socket
import subprocess
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TTS_MAIN = os.path.join(REPO, "native", "build", "tts_main")
HTTP_MAIN = os.path.join(REPO, "native", "build", "http_server_main")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(TTS_MAIN) and os.path.exists(HTTP_MAIN)),
    reason="native serving binaries not built (run ci.sh)")


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    """Tiny exported model bundle (config.json + params.npz + phones.txt)."""
    from wetts_tpu.config import Config
    from wetts_tpu.models.synthesizer import Synthesizer
    from wetts_tpu.utils.params_io import save_params_npz

    out = tmp_path_factory.mktemp("bundle")
    cfg_dict = {
        "train": {"segment_size": 2048},
        "data": {"filter_length": 256, "hop_length": 64, "win_length": 256,
                 "sampling_rate": 8000},
        "model": {
            "inter_channels": 16, "hidden_channels": 16,
            "filter_channels": 32, "n_heads": 2, "n_layers": 1,
            "kernel_size": 3, "p_dropout": 0.1, "resblock": "2",
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [4, 4, 2, 2], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [8, 8, 4, 4], "gin_channels": 8,
        },
        "num_phones": 16, "num_speakers": 2,
    }
    cfg = Config.from_dict(cfg_dict)
    model = Synthesizer.from_config(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng, "slice": rng},
        jnp.ones((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 36, cfg.data.spec_channels)), jnp.array([36]),
        jnp.array([0]))
    with open(out / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_params_npz(str(out / "params.npz"), variables["params"])
    with open(out / "phones.txt", "w") as f:
        for i, ph in enumerate(["sil", "a", "b", "c"]):
            f.write(f"{ph} {i}\n")
    with open(out / "speaker.txt", "w") as f:
        f.write("spk0 0\nspk1 1\n")
    return str(out)


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return env


def test_tts_main_writes_wav(bundle, tmp_path):
    wav = tmp_path / "out.wav"
    proc = subprocess.run(
        [TTS_MAIN, "--model_dir", bundle, "--text", "a b c a b",
         "--wav_path", str(wav), "--sname", "spk0", "--repo_root", REPO],
        env=_env(), capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode()
    data = wav.read_bytes()
    assert data[:4] == b"RIFF" and len(data) > 44


def test_tts_main_flags_file(bundle, tmp_path):
    """Flag-file driven invocation (tts_main.cc:62-66 semantics)."""
    wav = tmp_path / "out.wav"
    flags_file = tmp_path / "tts.flags"
    flags_file.write_text(
        f"# comment line\n--model_dir={bundle}\n--sname=spk1\n"
        f"--repo_root={REPO}\n--streaming\n")
    proc = subprocess.run(
        [TTS_MAIN, "--flags_file", str(flags_file),
         "--text", "a b c a b c a b", "--wav_path", str(wav)],
        env=_env(), capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode()
    assert wav.read_bytes()[:4] == b"RIFF"


def test_http_server_main(bundle):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [HTTP_MAIN, "--model_dir", bundle, "--port", str(port),
         "--repo_root", REPO],
        env=_env(), stderr=subprocess.PIPE)
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                with socket.create_connection(("127.0.0.1", port), 1):
                    break
            except OSError:
                time.sleep(0.5)
                assert proc.poll() is None, proc.stderr.read().decode()
        url = f"http://127.0.0.1:{port}/?text=a+b+c&name=spk0"
        with urllib.request.urlopen(url, timeout=300) as resp:
            payload = json.loads(resp.read())
        assert payload["status"] == "ok"
        wav = base64.b64decode(payload["audio"])
        assert wav[:4] == b"RIFF"
        # missing text -> 400
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=60)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # streaming endpoint -> raw chunked PCM
        surl = f"http://127.0.0.1:{port}/stream?text=a+b+c+a+b"
        with urllib.request.urlopen(surl, timeout=300) as resp:
            pcm = resp.read()
        assert len(pcm) > 0 and len(pcm) % 2 == 0
        audio = np.frombuffer(pcm, "<i2")
        assert np.isfinite(audio.astype(np.float32)).all()
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
