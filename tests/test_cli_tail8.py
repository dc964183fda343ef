"""Round-3 CLI tail batch 6: basis-fMLLR, LVTLN, regtree-fMLLR and
fMPE estimation tools (parity: src/gmmbin transform tail)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        train_mono)
    d = tmp_path_factory.mktemp("tail8")
    train_txt, train_wav, _, _ = make_corpus(num_train=8, num_test=1)
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
    utts = sorted(tf)
    with open(f"{d}/spk2utt", "w") as f:
        for s in (0, 1):
            members = " ".join(u for i, u in enumerate(utts)
                               if i % 2 == s)
            f.write(f"spk{s} {members}\n")
    return dict(d=str(d), sys=sys_, tf=tf)


def test_basis_fmllr_ladder(env, tmp_path):
    d = env["d"]
    rc = get_tool("gmm-basis-fmllr-training")([
        "gmm-basis-fmllr-training", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
        f"{tmp_path}/fmllr.basis"])
    assert rc == 0
    rc = get_tool("gmm-est-basis-fmllr")([
        "gmm-est-basis-fmllr", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"{tmp_path}/fmllr.basis",
        f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
        f"ark:{tmp_path}/trans.ark"])
    assert rc == 0
    trans = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/trans.ark"))
    assert set(trans) == {"spk0", "spk1"}
    D = env["sys"].am.dim
    for W in trans.values():
        assert np.asarray(W).shape == (D, D + 1)
        # a genuine (non-identity) adaptation was estimated
        assert np.abs(np.asarray(W)[:, :D] - np.eye(D)).max() > 1e-4


def test_lvtln_ladder(env, tmp_path):
    d = env["d"]
    D = env["sys"].am.dim
    rc = get_tool("gmm-init-lvtln")([
        "gmm-init-lvtln", f"--dim={D}", "--num-classes=3",
        "--default-class=1", f"{tmp_path}/0.lvtln"])
    assert rc == 0
    # train class 2 on parallel features: warped = 1.1 * unwarped
    with TableWriter("matrix", f"ark:{tmp_path}/warped.ark") as w:
        for u, f in env["tf"].items():
            w.write(u, np.asarray(f) * 1.1)
    rc = get_tool("gmm-train-lvtln-special")([
        "gmm-train-lvtln-special", "--warp=1.1", "2",
        f"{tmp_path}/0.lvtln", f"{tmp_path}/1.lvtln",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/warped.ark"])
    assert rc == 0
    from kaldi_tpu.cli.tail8_tools import _read_lvtln
    from kaldi_tpu.base import io_funcs as iof
    with kaldi_io.input_stream(f"{tmp_path}/1.lvtln") as f:
        b = iof.init_input_stream(f)
        lv = _read_lvtln(f, b)
    np.testing.assert_allclose(lv.A[2], 1.1 * np.eye(D), atol=1e-3)
    assert lv.warps[2] == pytest.approx(1.1)
    rc = get_tool("gmm-est-lvtln-trans")([
        "gmm-est-lvtln-trans", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"{tmp_path}/1.lvtln", f"ark:{d}/feats.ark",
        f"ark:{d}/ali.ark", f"ark:{tmp_path}/trans.ark",
        f"ark,t:{tmp_path}/warps.ark"])
    assert rc == 0
    warps = dict(SequentialTableReader("float",
                                       f"ark:{tmp_path}/warps.ark"))
    # training data is unwarped: the 1.1-trained class must NOT win
    # (identity classes tie and either may be picked)
    assert all(w != pytest.approx(1.1) for w in warps.values()), warps


def test_regtree_fmllr_ladder(env, tmp_path):
    d = env["d"]
    rc = get_tool("gmm-make-regtree")([
        "gmm-make-regtree", "--max-leaves=2", f"{d}/final.mdl",
        f"{tmp_path}/regtree"])
    assert rc == 0
    rc = get_tool("gmm-est-regtree-fmllr-ali")([
        "gmm-est-regtree-fmllr-ali", f"--spk2utt=ark,t:{d}/spk2utt",
        "--fmllr-min-count=100", f"{d}/final.mdl",
        f"ark:{d}/feats.ark", f"ark:{d}/ali.ark", f"{tmp_path}/regtree",
        f"ark:{tmp_path}/xforms.ark"])
    assert rc == 0
    from kaldi_tpu.transform.regtree_fmllr import RegtreeFmllr
    from kaldi_tpu.util.table import ObjectHolder
    xf = dict(SequentialTableReader(ObjectHolder(RegtreeFmllr),
                                    f"ark:{tmp_path}/xforms.ark"))
    assert set(xf) == {"spk0", "spk1"}
    D = env["sys"].am.dim
    for m in xf.values():
        assert m.W.shape[1:] == (D, D + 1)


def test_fmpe_ladder(env, tmp_path):
    d = env["d"]
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    allx = np.concatenate(list(env["tf"].values()))
    rng = np.random.default_rng(0)
    ubm = DiagGmm(4, allx.shape[1])
    sel = allx[rng.choice(len(allx), 4, replace=False)]
    ubm.set_from_means_and_vars(np.ones(4) / 4, sel,
                                np.var(allx, 0)[None].repeat(4, 0))
    kaldi_io.write_kaldi_object(ubm.write, f"{tmp_path}/ubm")
    rc = get_tool("fmpe-init")(["fmpe-init", f"{tmp_path}/ubm",
                                f"{tmp_path}/0.fmpe"])
    assert rc == 0
    rc = get_tool("fmpe-est")([
        "fmpe-est", "--num-epochs=3", f"{d}/final.mdl",
        f"{tmp_path}/0.fmpe", f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
        f"{tmp_path}/1.fmpe"])
    assert rc == 0
    rc = get_tool("fmpe-apply-transform")([
        "fmpe-apply-transform", f"{tmp_path}/1.fmpe",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/out.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/out.ark"))
    u = sorted(env["tf"])[0]
    f0 = np.asarray(env["tf"][u])
    assert out[u].shape == f0.shape
    delta = np.abs(out[u] - f0)
    assert 0 < delta.max() < 10.0      # trained offsets, bounded