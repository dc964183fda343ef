"""Legacy online CLIs (src/onlinebin): online-wav-gmm-decode-faster,
online-audio-server-decode-faster + online-audio-client (TCP, the
reference's RESULT:/WSE protocol), and the wake-word decoder."""

import os
import socket
import sys
import threading
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def run(tool, *args):
    rc = get_tool(tool)([tool] + [str(a) for a in args])
    assert rc == 0, f"{tool} failed with {rc}"


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus, unigram_g

    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.cli.online_legacy_tools import _legacy_gmm_pipeline
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions
    from kaldi_tpu.feat.wave import WaveData
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    d = tmp_path_factory.mktemp("online_legacy")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=10, num_test=3)
    mfcc_opts = MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0))

    def legacy_feats(wav):
        # train on EXACTLY the tool's online chain (CMN + deltas)
        pipe = _legacy_gmm_pipeline(mfcc_opts, 600, 100, None, 4, 4)
        pipe.accept_waveform(FS, wav)
        pipe.input_finished()
        return pipe.get_frames(0, pipe.num_frames_ready())

    tf = {u: legacy_feats(w) for u, w in train_wav.items()}
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=6, totgauss=32,
                                       realign_iters=(1, 2, 3, 4)))
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, make_hclg(sys_, unigram_g(lang)))
    with open(f"{d}/words.txt", "w") as f:
        for w, i in sorted(lang.words.items(), key=lambda kv: kv[1]):
            f.write(f"{w} {i}\n")
    sil_id = lang.phones["SIL"]
    scp = []
    for utt, wav in sorted(test_wav.items()):
        p = d / f"{utt}.wav"
        with open(p, "wb") as f:
            WaveData(FS, np.asarray(wav)[None, :]).write(f)
        scp.append(f"{utt} {p}")
    (d / "wav.scp").write_text("\n".join(scp) + "\n")
    return dict(d=str(d), fs=FS, lang=lang, test_txt=test_txt,
                sil=str(sil_id), mfcc=mfcc_opts)


def _expected_words(env):
    lang = env["lang"]
    return {u: [lang.words[w] for w in txt]
            for u, txt in env["test_txt"].items()}


def test_online_wav_gmm_decode_faster(env, tmp_path):
    d = env["d"]
    run("online-wav-gmm-decode-faster", f"--sample-frequency={env['fs']}",
        "--dither=0.0", "--acoustic-scale=0.1",
        f"scp:{d}/wav.scp", f"{d}/final.mdl", f"{d}/HCLG.fst",
        f"{d}/words.txt", env["sil"], f"ark:{tmp_path}/w.ark",
        f"ark:{tmp_path}/a.ark")
    words = {k: list(v) for k, v in SequentialTableReader(
        "int-vector", f"ark:{tmp_path}/w.ark")}
    ali = {k: list(v) for k, v in SequentialTableReader(
        "int-vector", f"ark:{tmp_path}/a.ark")}
    exp = _expected_words(env)
    assert set(words) == set(exp)

    def edits(a, b):
        D = np.zeros((len(a) + 1, len(b) + 1), int)
        D[:, 0] = np.arange(len(a) + 1)
        D[0, :] = np.arange(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                              D[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return D[-1, -1]

    # the online CMN/delta chain decodes the synthetic corpus nearly
    # exactly; allow a single edge-effect insertion per utterance
    for k in exp:
        assert edits(words[k], exp[k]) <= 1, (k, words[k], exp[k])
    for k in ali:
        assert len(ali[k]) > 0


def test_audio_server_and_client(env, tmp_path):
    d = env["d"]
    port = 18629
    err = []

    def serve():
        try:
            run("online-audio-server-decode-faster",
                f"--sample-frequency={env['fs']}", "--dither=0.0",
                "--acoustic-scale=0.1", "--max-connections=4",
                f"--samp-freq={env['fs']}",
                f"{d}/final.mdl", f"{d}/HCLG.fst", f"{d}/words.txt",
                env["sil"], port)
        except Exception as e:      # surface in the main thread
            err.append(e)

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    for _ in range(100):
        try:
            socket.create_connection(("127.0.0.1", port),
                                     timeout=0.2).close()
            break
        except OSError:
            time.sleep(0.1)
    # that probe consumed one connection (empty stream); 2 remain
    import contextlib
    import io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        run("online-audio-client", "127.0.0.1", port,
            f"scp:{d}/wav.scp")
    th.join(timeout=60)
    assert not err, err
    out = buf.getvalue()
    assert "RESULT:NUM=" in out and "FORMAT=WSE" in out
    # at least one correctly recognized word with times
    lang = env["lang"]
    assert any(w in out for w in ("YES", "NO"))
    assert "RESULT:DONE" in out


def test_wake_word_decoder(env, tmp_path):
    """Contract test with a matched nnet3 model is not possible here
    (random AM); verify the control flow: with an impossible wake-word
    id the tool decodes everything; with the first decoded word as the
    wake word it reports detection."""
    d = env["d"]
    # nnet3 .mdl: random affine over the same transition model
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.nnet3.mdl_io import read_raw_nnet3, write_nnet3_am
    tm, _am = read_am_gmm(f"{d}/final.mdl")
    rng = np.random.default_rng(0)
    D, P = 13, tm.num_pdfs
    lin = rng.normal(scale=0.1, size=(P, D))
    rows = "\n".join(" ".join(f"{v:.5f}" for v in r) + " " for r in lin)
    raw = (f"<Nnet3>\ninput-node name=input dim={D}\n"
           "component-node name=aff component=aff input=input\n"
           "output-node name=output input=aff objective=linear\n\n"
           "<NumComponents> 1\n"
           "<ComponentName> aff <NaturalGradientAffineComponent> "
           "<LearningRate> 0.001 <LinearParams>  [\n" + rows + "]\n"
           "<BiasParams>  [ " + " ".join("0" for _ in range(P)) +
           " ]\n<RankIn> 20 <RankOut> 80 <UpdatePeriod> 4 "
           "<NumSamplesHistory> 2000 <Alpha> 4 "
           "</NaturalGradientAffineComponent>\n</Nnet3>\n")
    (tmp_path / "a.raw").write_text(raw)
    g = read_raw_nnet3(str(tmp_path / "a.raw"))
    write_nnet3_am(f"{tmp_path}/am.mdl", tm, g)
    utts = [line.split()[0] for line in
            open(f"{d}/wav.scp").read().splitlines()]
    (tmp_path / "spk2utt").write_text("spk " + " ".join(utts) + "\n")
    run("online2-wav-nnet3-wake-word-decoder-faster",
        f"--sample-frequency={env['fs']}", "--dither=0.0",
        "--frame-subsampling-factor=1", "--wake-word-id=-1",
        f"{tmp_path}/am.mdl", f"{d}/HCLG.fst",
        f"ark,t:{tmp_path}/spk2utt", f"scp:{d}/wav.scp",
        f"{d}/words.txt", f"ark:{tmp_path}/w.ark",
        f"ark:{tmp_path}/a.ark")
    words = {k: list(v) for k, v in SequentialTableReader(
        "int-vector", f"ark:{tmp_path}/w.ark")}
    assert set(words) == set(utts)
    # pick a word the model actually outputs and use it as wake word
    first = next((w for ws in words.values() for w in ws), None)
    if first is not None:
        run("online2-wav-nnet3-wake-word-decoder-faster",
            f"--sample-frequency={env['fs']}", "--dither=0.0",
            "--frame-subsampling-factor=1", f"--wake-word-id={first}",
            f"{tmp_path}/am.mdl", f"{d}/HCLG.fst",
            f"ark,t:{tmp_path}/spk2utt", f"scp:{d}/wav.scp",
            f"{d}/words.txt", f"ark:{tmp_path}/w2.ark",
            f"ark:{tmp_path}/a2.ark")
        w2 = {k: list(v) for k, v in SequentialTableReader(
            "int-vector", f"ark:{tmp_path}/w2.ark")}
        assert any(first in ws for ws in w2.values())
