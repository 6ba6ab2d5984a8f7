"""Vendored offline data assets (wetts_tpu/assets).

The reference ships its frontend tables in-repo
(examples/chinese_prosody_polyphone/lexicon: 6,873-entry pinyin_dict,
470-class polyphone table, 5 prosody ranks) and fetches CMUdict at recipe
time; these tests run the REAL tables through the CLI frontend and the
English G2P through the vendored mini-CMUdict — no fabricated fixtures.
"""

import numpy as np

from wetts_tpu.assets import cmudict_path, lexicon_path, resolve
from wetts_tpu.cli.frontend import CharFrontend, read_char2pinyins, read_list
from wetts_tpu.text.g2p_en import G2pEn
from wetts_tpu.text.lexicon import read_pinyin2phones


def test_vendored_tables_shapes():
    assert len(read_char2pinyins(lexicon_path("pinyin_dict.txt"))) == 6873
    assert len(read_list(lexicon_path("polyphone.txt"))) == 470
    assert len(read_list(lexicon_path("prosody.txt"))) == 5
    lex = read_pinyin2phones(lexicon_path("lexicon.txt"))
    assert len(lex) > 4000
    assert lex["hao3"] == ["h", "ao3"]
    assert lex["zhuang4"] == ["zh", "uang4"]


def test_resolve_prefers_bundle_then_assets(tmp_path):
    assert resolve(str(tmp_path), "lexicon",
                   "pinyin_dict.txt") == lexicon_path("pinyin_dict.txt")
    (tmp_path / "lexicon").mkdir()
    (tmp_path / "lexicon" / "pinyin_dict.txt").write_text("你 ni3\n")
    assert resolve(str(tmp_path), "lexicon", "pinyin_dict.txt").startswith(
        str(tmp_path))


def test_char_frontend_on_real_tables(tmp_path):
    """CLI frontend over the full vendored tables: a bundle that carries
    only the model vocab (like a minimal export) still produces phones."""
    chars = "你好天气很好吗"
    vocab = ["[CLS]", "[SEP]", "[UNK]"] + sorted(set(chars))
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")

    polyphone2id = read_list(lexicon_path("polyphone.txt"))

    def scorer(ids):
        t = len(ids)
        rng = np.random.default_rng(0)
        poly = rng.random((t, len(polyphone2id))).astype(np.float32)
        pros = np.zeros((t, 5), np.float32)
        pros[:, 1] = 1.0  # every char a #1 boundary
        return poly, pros

    fe = CharFrontend.from_dir(scorer, str(tmp_path))
    assert len(fe.char2pinyins) == 6873
    phones = fe.compute(chars)
    assert phones[-1] == "#4"
    # every char yielded its pinyin's phones + a prosody tag
    tags = [p for p in phones if p.startswith("#")]
    assert len(tags) == len(chars)
    assert "h" in phones and "ao3" in phones  # 好 hao3 via real lexicon
    # polyphone disambiguation ran against the real candidate sets
    assert all(py in fe.pinyin2phones or py in fe.polyphone2id
               for cands in [fe.char2pinyins[c] for c in chars]
               for py in cands)


def test_mini_cmudict_g2p():
    g2p = G2pEn(cmudict_path())
    assert g2p.convert("hello") == ["HH", "AH0", "L", "OW1"]
    assert g2p.convert("world") == ["W", "ER1", "L", "D"]
    # compound split over dictionary words
    assert g2p.convert("helloworld") == [
        "HH", "AH0", "L", "OW1", "W", "ER1", "L", "D"]
    # short OOV is spelled letter-by-letter with #0 (g2p_en.cc:77-82)
    spelled = g2p.convert("tpu")
    assert "#0" in spelled and spelled[0] == "T"
    # long OOV falls to letter-to-sound: pronounceable, nonempty
    lts = g2p.convert("cromulent")
    assert len(lts) >= 5 and all(not p.startswith("#") for p in lts)
