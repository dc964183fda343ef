"""sgmm2bin CLI ladder (parity: src/sgmm2bin + egs sgmm2 recipes):
init -> acc/est EM -> speaker vectors -> adapted acc/est -> decode."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.cli.sgmm2_tools import read_am_sgmm2
from kaldi_tpu.fstext.openfst_io import write_fst
from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def sgmm2_env(tmp_path_factory):
    """Mono bootstrap on the synthetic corpus; all inputs as files."""
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        make_hclg, train_mono)

    d = tmp_path_factory.mktemp("sgmm2")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=3)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=5, totgauss=30,
                                       realign_iters=(1, 2, 3, 4)))
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    ali = _align_all(sys_, graphs, tf, 10.0, 0.1, 1.0)

    kaldi_io.write_kaldi_object(sys_.tm.topo.write, f"{d}/topo")
    kaldi_io.write_kaldi_object(sys_.tree.write, f"{d}/tree")
    allx = np.concatenate(list(tf.values())).astype(np.float64)
    rng = np.random.default_rng(0)
    ubm = FullGmm(8, allx.shape[1])
    sel = allx[rng.choice(len(allx), 8, replace=False)]
    ubm.set_from_means_and_covars(
        np.ones(8) / 8, sel,
        np.stack([np.cov(allx.T) + 1e-2 * np.eye(allx.shape[1])] * 8))
    kaldi_io.write_kaldi_object(ubm.write, f"{d}/ubm")
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    with TableWriter("matrix", f"ark:{d}/test_feats.ark") as w:
        for u in sorted(sf):
            w.write(u, sf[u])
    with TableWriter("int-vector", f"ark:{d}/ali.ark") as w:
        for u in sorted(ali):
            w.write(u, np.asarray(ali[u], np.int32))
    # two synthetic speakers: even/odd utterances
    utts = sorted(tf)
    with open(f"{d}/utt2spk", "w") as f:
        for i, u in enumerate(utts):
            f.write(f"{u} spk{i % 2}\n")
    with open(f"{d}/spk2utt", "w") as f:
        for s in (0, 1):
            members = " ".join(u for i, u in enumerate(utts)
                               if i % 2 == s)
            f.write(f"spk{s} {members}\n")
    hclg = make_hclg(sys_, unigram_g(lang))
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, hclg)
    return dict(d=str(d), test_txt=test_txt, lang=lang)


def test_sgmm2_cli_ladder(sgmm2_env):
    d = sgmm2_env["d"]
    rc = get_tool("sgmm2-init")([
        "sgmm2-init", "--spk-space-dim=2", f"{d}/topo", f"{d}/tree",
        f"{d}/ubm", f"{d}/0.mdl"])
    assert rc == 0
    mdl = f"{d}/0.mdl"
    for it in range(4):
        rc = get_tool("sgmm2-acc-stats-ali")([
            "sgmm2-acc-stats-ali", mdl, f"ark:{d}/feats.ark",
            f"ark:{d}/ali.ark", f"{d}/{it}.acc"])
        assert rc == 0
        rc = get_tool("sgmm2-est")([
            "sgmm2-est", mdl, f"{d}/{it}.acc", f"{d}/{it + 1}.mdl"])
        assert rc == 0
        mdl = f"{d}/{it + 1}.mdl"
    # sum-accs: doubling the stats must be accepted
    rc = get_tool("sgmm2-sum-accs")([
        "sgmm2-sum-accs", f"{d}/sum.acc", f"{d}/3.acc", f"{d}/3.acc"])
    assert rc == 0
    # speaker vectors per spk2utt
    rc = get_tool("sgmm2-est-spkvecs")([
        "sgmm2-est-spkvecs", f"--spk2utt=ark,t:{d}/spk2utt", mdl,
        f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
        f"ark:{d}/vecs.ark"])
    assert rc == 0
    vecs = dict(SequentialTableReader("vector", f"ark:{d}/vecs.ark"))
    assert set(vecs) == {"spk0", "spk1"}
    # speaker-adapted accumulation round
    rc = get_tool("sgmm2-acc-stats-ali")([
        "sgmm2-acc-stats-ali", f"--spk-vecs=ark:{d}/vecs.ark",
        f"--utt2spk=ark,t:{d}/utt2spk", mdl, f"ark:{d}/feats.ark",
        f"ark:{d}/ali.ark", f"{d}/adapt.acc"])
    assert rc == 0
    rc = get_tool("sgmm2-est")([
        "sgmm2-est", mdl, f"{d}/adapt.acc", f"{d}/final.mdl"])
    assert rc == 0
    tm, am = read_am_sgmm2(f"{d}/final.mdl")
    assert am.spk_dim == 2 and am.u is not None
    # decode the test set
    rc = get_tool("sgmm2-latgen-faster")([
        "sgmm2-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/final.mdl", f"{d}/HCLG.fst", f"ark:{d}/test_feats.ark",
        f"ark:{d}/lat.ark", f"ark:{d}/words.ark"])
    assert rc == 0
    lang = sgmm2_env["lang"]
    errs = tot = 0
    hyps = dict(SequentialTableReader("int-vector",
                                      f"ark:{d}/words.ark"))
    for u, ref in sgmm2_env["test_txt"].items():
        hyp = [lang.word_names[w] for w in hyps.get(u, [])]
        tot += len(ref)
        if hyp != list(ref):
            errs += 1
    assert tot > 0 and errs <= 1, (errs, tot)


def test_sgmm2_info_and_copy(sgmm2_env, capsys):
    d = sgmm2_env["d"]
    rc = get_tool("sgmm2-copy")([
        "sgmm2-copy", "--binary=false", f"{d}/final.mdl",
        f"{d}/final_txt.mdl"])
    assert rc == 0
    tm1, am1 = read_am_sgmm2(f"{d}/final.mdl")
    tm2, am2 = read_am_sgmm2(f"{d}/final_txt.mdl")
    x = np.random.default_rng(0).normal(size=(5, am1.dim))
    np.testing.assert_allclose(am2.log_likes(x), am1.log_likes(x),
                               rtol=1e-4, atol=1e-3)
    rc = get_tool("sgmm2-info")(["sgmm2-info", f"{d}/final.mdl"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "spk-space dimension 2" in out
    assert "speaker-dependent weights yes" in out
