"""The generic corpus recipe (egs/template/run.py) end-to-end on a
fabricated corpus in the standard Kaldi data layout — exercises
validate/prepare-lang, CLI mono training, the train_deltas triphone
stage, ARPA G compilation, the lattice scoring sweep, the tri2
LDA+MLLT stage, and the tri3 SAT stage with fMLLR two-pass decode."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, WORD_TONES  # noqa: E402

ARPA = """\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.60206 YES -0.30103
-0.60206 NO -0.30103
-1.0 HEY -0.30103
-99 <s> -0.30103
-0.60206 </s>

\\2-grams:
-0.47712 YES NO
-0.47712 NO YES
-0.60206 <s> YES
-0.60206 <s> NO

\\end\\
"""

TONES = dict(WORD_TONES)
TONES["HEY"] = (700.0, 1800.0)


def synth(words, seed):
    rng = np.random.default_rng(seed)
    sil = lambda n: 60.0 * rng.normal(size=n)  # noqa: E731
    parts = [sil(int(0.3 * FS))]
    for w in words:
        n = int(0.25 * FS)
        t = np.arange(n) / FS
        f1, f2 = TONES[w]
        seg = (2500 * np.sin(2 * np.pi * f1 * t)
               + 1500 * np.sin(2 * np.pi * f2 * t)
               + 60 * rng.normal(size=n))
        env = np.minimum(1.0, np.minimum(np.arange(n),
                                         n - np.arange(n)) / (0.02 * FS))
        parts.append(seg * env)
        parts.append(sil(int(0.25 * FS)))
    return np.concatenate(parts).astype(np.float32)


def make_standard_corpus(root):
    from kaldi_tpu.feat.wave import WaveData
    rng = np.random.default_rng(7)
    words = ["YES", "NO", "HEY"]
    train, test = {}, {}
    for i in range(14):
        train[f"tr{i:02d}"] = [words[int(rng.integers(3))]
                               for _ in range(4)]
    for i in range(4):
        test[f"te{i:02d}"] = [words[int(rng.integers(3))]
                              for _ in range(4)]
    for split, utts in (("train", train), ("test", test)):
        sd = os.path.join(root, split)
        os.makedirs(sd, exist_ok=True)
        with open(os.path.join(sd, "wav.scp"), "w") as scp, \
                open(os.path.join(sd, "text"), "w") as text, \
                open(os.path.join(sd, "utt2spk"), "w") as u2s:
            for i, (utt, ws) in enumerate(sorted(utts.items())):
                import zlib
                wav = synth(ws, seed=zlib.crc32(utt.encode()) % 100000)
                p = os.path.join(sd, f"{utt}.wav")
                with open(p, "wb") as f:
                    WaveData(FS, wav[None, :]).write(f)
                scp.write(f"{utt} {p}\n")
                text.write(f"{utt} {' '.join(ws)}\n")
                u2s.write(f"{utt} spk{i % 3}\n")
    with open(os.path.join(root, "lexicon.txt"), "w") as f:
        f.write("YES Y\nNO N\nHEY H EY\n")
    with open(os.path.join(root, "lm.arpa"), "w") as f:
        f.write(ARPA)
    return train, test


@pytest.mark.slow
def test_template_recipe_end_to_end(tmp_path):
    root = str(tmp_path)
    make_standard_corpus(root)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "egs", "template"))
    import importlib
    import run as template_run
    importlib.reload(template_run)
    wer = template_run.main([
        "--train", os.path.join(root, "train"),
        "--test", os.path.join(root, "test"),
        "--lexicon", os.path.join(root, "lexicon.txt"),
        "--arpa", os.path.join(root, "lm.arpa"),
        "--dir", os.path.join(root, "exp"),
        "--num-leaves", "40", "--tot-gauss", "80",
    ])
    assert wer is not None and wer <= 10.0
    # artifacts in the expected places
    for f in ("lang/L.fst", "lang/G.fst", "mono/final.mdl",
              "tri1/final.mdl", "tri1/HCLG.fst", "tri1/lat.ark",
              "tri2/final.mdl", "tri2/final.mat",
              "tri3/final.mdl"):
        assert os.path.exists(os.path.join(root, "exp", f)), f
    # stage 8: flat-start e2e chain rides on the prepared lang/G only
    # (no GMM artifacts needed) — looser bar, it forgoes alignments
    chain_wer = template_run.main([
        "--train", os.path.join(root, "train"),
        "--test", os.path.join(root, "test"),
        "--lexicon", os.path.join(root, "lexicon.txt"),
        "--arpa", os.path.join(root, "lm.arpa"),
        "--dir", os.path.join(root, "exp"),
        "--stage", "8", "--chain-epochs", "30",
    ])
    assert chain_wer is not None and chain_wer <= 15.0
