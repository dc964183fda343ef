"""Online2 + alignment CLI tail (parity: online2bin
online2-tcp-nnet3-decode-faster, online2-wav-dump-features; bin
align-compiled-mapped; nnet3bin nnet3-align-compiled)."""

import os
import socket
import sys
import threading

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    from kaldi_tpu.util.table import TableWriter as TW
    d = tmp_path_factory.mktemp("online2")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=2)
    opts = MfccOptions(frame_opts=FrameExtractionOptions(
        samp_freq=FS, dither=0.0))
    comp = OfflineFeature(opts)
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=5, totgauss=24,
                                       realign_iters=(1, 2, 3, 4)))
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    hclg = make_hclg(sys_, unigram_g(lang))
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, hclg)
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    with open(f"{d}/words.txt", "w") as f:
        for wid, name in sorted(lang.word_names.items()):
            f.write(f"{name} {wid}\n")
    with TW("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    from kaldi_tpu.fstext.fst import VectorFst
    with TW(VectorFst, f"ark:{d}/graphs.ark") as w:
        for u in sorted(graphs):
            w.write(u, graphs[u])
    from kaldi_tpu.feat.wave import WaveData
    with TW("wave", f"ark:{d}/wav.ark") as w:
        for u, wav in test_wav.items():
            w.write(u, WaveData(FS, np.clip(wav, -32767,
                                            32767).astype(np.float32)))
    return dict(d=str(d), sys=sys_, tf=tf, fs=FS, opts=opts,
                test_wav=test_wav, test_txt=test_txt, lang=lang)


def test_online2_wav_dump_features(env):
    d = env["d"]
    fs = env["fs"]
    rc = get_tool("online2-wav-dump-features")([
        "online2-wav-dump-features", f"--sample-frequency={fs}",
        "--dither=0.0", f"ark:{d}/wav.ark", f"ark:{d}/ofeats.ark"])
    assert rc == 0
    from kaldi_tpu.feat.frontend import OfflineFeature
    comp = OfflineFeature(env["opts"])
    out = dict(SequentialTableReader("matrix", f"ark:{d}/ofeats.ark"))
    for u, wav in env["test_wav"].items():
        ref = comp.compute(np.asarray(wav, np.float32))
        got = out[u]
        assert got.shape == ref.shape
        # chunked-online vs one-shot-offline float paths differ
        # slightly; agreement must be tight on average
        diff = np.abs(np.asarray(got) - ref)
        assert diff.mean() < 0.05 and diff.max() < 1.0, \
            (diff.mean(), diff.max())


def test_align_compiled_mapped(env, tmp_path):
    d = env["d"]
    rc = get_tool("gmm-compute-likes")([
        "gmm-compute-likes", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/likes.ark"])
    assert rc == 0
    rc = get_tool("align-compiled-mapped")([
        "align-compiled-mapped", "--acoustic-scale=0.1",
        f"{d}/final.mdl", f"ark:{d}/graphs.ark",
        f"ark:{tmp_path}/likes.ark", f"ark:{tmp_path}/ali.ark"])
    assert rc == 0
    sys_ = env["sys"]
    ali = dict(SequentialTableReader("int-vector",
                                     f"ark:{tmp_path}/ali.ark"))
    assert len(ali) == len(env["tf"])
    for u, a in ali.items():
        assert len(a) == env["tf"][u].shape[0]
        assert all(1 <= t <= sys_.tm.num_transition_ids for t in a)


def test_tcp_nnet3_decode_faster_cli(env, tmp_path):
    """Protocol-level drive of the CLI: serve one connection with a
    tiny (untrained) nnet3 .mdl and assert a '\\n'-terminated final."""
    d = env["d"]
    sys_ = env["sys"]
    # build a minimal .mdl: identity-ish linear layer 13 -> num_pdfs
    from kaldi_tpu.nnet3.mdl_io import (read_raw_nnet3, write_nnet3_am)
    rng = np.random.default_rng(0)
    D, P = 13, sys_.tm.num_pdfs
    lin = rng.normal(scale=0.1, size=(P, D))
    rows = "\n".join(" ".join(f"{v:.5f}" for v in r) + " "
                     for r in lin)
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
    write_nnet3_am(str(tmp_path / "am.mdl"), sys_.tm, g)

    rcs = {}

    def serve():
        rcs["rc"] = get_tool("online2-tcp-nnet3-decode-faster")([
            "online2-tcp-nnet3-decode-faster", "--port-num=0",
            f"--samp-freq={env['fs']}",
            f"--sample-frequency={env['fs']}", "--dither=0.0",
            "--frame-subsampling-factor=1", "--num-connections=1",
            str(tmp_path / "am.mdl"), f"{d}/HCLG.fst",
            f"{d}/words.txt"])

    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    port_line = {}

    def serve_captured():
        with redirect_stdout(buf):
            serve()

    th = threading.Thread(target=serve_captured, daemon=True)
    th.start()
    # wait for the listening line
    import time
    for _ in range(100):
        if "listening on" in buf.getvalue():
            break
        time.sleep(0.1)
    assert "listening on" in buf.getvalue(), buf.getvalue()
    host, port = buf.getvalue().split("listening on ")[1].split()[0] \
        .rsplit(":", 1)
    wav = next(iter(env["test_wav"].values()))
    pcm = np.clip(wav, -32768, 32767).astype("<i2").tobytes()
    with socket.create_connection((host, int(port)), timeout=30) as s:
        s.sendall(pcm)
        s.shutdown(socket.SHUT_WR)
        out = b""
        while True:
            data = s.recv(4096)
            if not data:
                break
            out += data
    th.join(timeout=30)
    assert not th.is_alive()
    assert rcs.get("rc") == 0
    assert out.decode().endswith("\n")
