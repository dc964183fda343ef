"""Round-3 CLI tail batch 5: logistic regression (language-id
backend) + compute-gop (parity: ivectorbin, src/bin)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def test_logistic_regression_train_eval(tmp_path):
    rng = np.random.default_rng(0)
    centers = np.asarray([[2.0, 0.0], [-2.0, 0.0], [0.0, 2.5]])
    with TableWriter("vector", f"ark:{tmp_path}/x.ark") as wx, \
            TableWriter("int", f"ark:{tmp_path}/y.ark") as wy:
        for i in range(240):
            c = i % 3
            wx.write(f"u{i:03d}", centers[c]
                     + 0.5 * rng.normal(size=2))
            wy.write(f"u{i:03d}", c)
    rc = get_tool("logistic-regression-train")([
        "logistic-regression-train", "--max-steps=150",
        f"ark:{tmp_path}/x.ark", f"ark:{tmp_path}/y.ark",
        f"{tmp_path}/lr.mdl"])
    assert rc == 0
    rc = get_tool("logistic-regression-eval")([
        "logistic-regression-eval", f"{tmp_path}/lr.mdl",
        f"ark:{tmp_path}/x.ark", f"ark:{tmp_path}/post.ark"])
    assert rc == 0
    posts = dict(SequentialTableReader("vector",
                                       f"ark:{tmp_path}/post.ark"))
    hits = sum(int(np.argmax(posts[f"u{i:03d}"]) == i % 3)
               for i in range(240))
    assert hits / 240 > 0.95, hits
    # mix-up variant also trains and evaluates
    rc = get_tool("logistic-regression-train")([
        "logistic-regression-train", "--max-steps=150", "--mix-up=6",
        f"ark:{tmp_path}/x.ark", f"ark:{tmp_path}/y.ark",
        f"{tmp_path}/lr6.mdl"])
    assert rc == 0
    from kaldi_tpu.ivector.logistic_regression import LogisticRegression
    m = kaldi_io.read_kaldi_object(LogisticRegression.read,
                                   f"{tmp_path}/lr6.mdl")
    assert m.weights.shape[0] == 6 and m.num_classes == 3
    # prior scaling shifts posteriors toward the scaled class
    rc = get_tool("logistic-regression-copy")([
        "logistic-regression-copy", "--scale-priors=1000:1:1",
        f"{tmp_path}/lr.mdl", f"{tmp_path}/lr_p.mdl"])
    assert rc == 0
    m0 = kaldi_io.read_kaldi_object(LogisticRegression.read,
                                    f"{tmp_path}/lr.mdl")
    mp = kaldi_io.read_kaldi_object(LogisticRegression.read,
                                    f"{tmp_path}/lr_p.mdl")
    x = np.zeros((1, 2))
    assert mp.log_posteriors(x)[0, 0] > m0.log_posteriors(x)[0, 0]


def test_draw_tree_and_misc(tmp_path, capsys):
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.tree import monophone_context_dependency
    phones = [1, 2, 3]
    tree = monophone_context_dependency(phones, {p: 3 for p in phones})
    kaldi_io.write_kaldi_object(tree.write, f"{tmp_path}/tree")
    (tmp_path / "phones.txt").write_text("a 1\nb 2\nc 3\n")
    rc = get_tool("draw-tree")([
        "draw-tree", f"{tmp_path}/phones.txt", f"{tmp_path}/tree"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("digraph tree {") and "pdf" in out
    assert "a" in out  # phone names used


def test_extend_wav_with_silence(tmp_path):
    from kaldi_tpu.feat.wave import WaveData
    rng = np.random.default_rng(0)
    w = (rng.standard_normal(8000) * 1000).astype(np.float32)
    with TableWriter("wave", f"ark:{tmp_path}/w.ark") as wr:
        wr.write("u1", WaveData(8000.0, w))
    rc = get_tool("extend-wav-with-silence")([
        "extend-wav-with-silence", "--extra-silence-length=0.5",
        f"ark:{tmp_path}/w.ark", f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("wave", f"ark:{tmp_path}/o.ark"))
    ext = out["u1"].channel(0)
    assert len(ext) == 8000 + 4000
    assert np.abs(ext[-4000:]).max() == 0


def test_xvector_get_egs(tmp_path):
    from kaldi_tpu.nnet3.egs import ExampleHolder
    rng = np.random.default_rng(0)
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", rng.normal(size=(250, 20)).astype(np.float32))
    with TableWriter("int", f"ark:{tmp_path}/spk.ark") as w:
        w.write("u1", 7)
    rc = get_tool("nnet3-xvector-get-egs")([
        "nnet3-xvector-get-egs", "--frames-per-chunk=100",
        f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/spk.ark",
        f"ark:{tmp_path}/egs.ark"])
    assert rc == 0
    egs = list(SequentialTableReader(ExampleHolder(),
                                     f"ark:{tmp_path}/egs.ark"))
    assert len(egs) == 2
    for _k, eg in egs:
        assert eg.feats.shape == (100, 20)
        assert eg.targets == [[(7, 1.0)]]


def test_sum_lda_accs(tmp_path):
    from kaldi_tpu.transform.lda import LdaEstimate
    rng = np.random.default_rng(0)
    est = LdaEstimate(2, 3)
    for i in range(40):
        est.accumulate(rng.normal(size=(1, 3)) + (i % 2), i % 2)
    kaldi_io.write_kaldi_object(est.write, f"{tmp_path}/a1.acc")
    rc = get_tool("sum-lda-accs")([
        "sum-lda-accs", f"{tmp_path}/sum.acc", f"{tmp_path}/a1.acc",
        f"{tmp_path}/a1.acc"])
    assert rc == 0
    tot = kaldi_io.read_kaldi_object(LdaEstimate.read,
                                     f"{tmp_path}/sum.acc")
    np.testing.assert_allclose(tot.zero_acc, 2 * est.zero_acc)


@pytest.fixture(scope="module")
def gop_env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        train_mono)
    d = tmp_path_factory.mktemp("gop")
    train_txt, train_wav, _, _ = make_corpus(num_train=6, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=4, totgauss=24,
                                       realign_iters=(1, 2, 3)))
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    ali = _align_all(sys_, graphs, tf, 10.0, 0.1, 1.0)
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    with TableWriter("int-vector", f"ark:{d}/ali.ark") as w:
        for u in sorted(ali):
            w.write(u, np.asarray(ali[u], np.int32))
    return dict(d=str(d), sys=sys_, tf=tf, ali=ali)


def test_compute_gop(gop_env, tmp_path):
    d = gop_env["d"]
    rc = get_tool("gmm-compute-likes")([
        "gmm-compute-likes", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/likes.ark"])
    assert rc == 0
    rc = get_tool("compute-gop")([
        "compute-gop", f"{d}/final.mdl", f"ark:{d}/ali.ark",
        f"ark:{tmp_path}/likes.ark", f"ark:{tmp_path}/gop.ark",
        f"ark:{tmp_path}/phnfeat.ark"])
    assert rc == 0
    gop = dict(SequentialTableReader("posterior",
                                     f"ark:{tmp_path}/gop.ark"))
    feats = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/phnfeat.ark"))
    sys_ = gop_env["sys"]
    for u, segs in gop.items():
        # correctly-pronounced synthetic data: GOP near zero (<= 0 by
        # construction) and rarely catastrophic
        vals = [g for seg in segs for _ph, g in seg]
        assert all(v <= 1e-9 for v in vals)
        assert np.median(vals) > -1.0, (u, vals)
        # segment phones match the alignment's phone sequence
        ali_phones = []
        for t, tid in enumerate(gop_env["ali"][u]):
            ph = sys_.tm.transition_id_to_phone(int(tid))
            if not ali_phones or ali_phones[-1] != ph:
                ali_phones.append(ph)
        seg_phones = [seg[0][0] for seg in segs]
        # collapse adjacent repeats in seg_phones for comparison
        collapsed = [p for i, p in enumerate(seg_phones)
                     if i == 0 or seg_phones[i - 1] != p]
        assert collapsed == ali_phones
        assert feats[u].shape == (len(segs),
                                  len(sys_.tm.get_phones()))
