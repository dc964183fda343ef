"""nnet3-latgen-faster variants (-looped, -batch, -lookahead) decode
the same words as the base tool on the same model/graph (parity:
src/nnet3bin/nnet3-latgen-faster-looped.cc:1, -batch.cc:1,
-lookahead.cc:1 — the variants change HOW the AM is evaluated or how
the graph is composed, not WHAT is decoded)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def run(tool, *args):
    rc = get_tool(tool)([tool] + [str(a) for a in args])
    assert rc == 0, f"{tool} failed with {rc}"


XCONFIG = """
input dim=13 name=input
relu-batchnorm-layer name=tdnn1 dim=32 input=Append(-2,-1,0,1,2)
relu-batchnorm-layer name=tdnn2 dim=32 input=Append(-1,0,1)
output-layer name=output include-log-softmax=true dim=$num_targets
"""


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    import jax

    from test_mono_e2e import FS, make_corpus, unigram_g

    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.nnet3.xconfig import build_xconfig_model
    from kaldi_tpu.parallel.checkpoint import save_checkpoint
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    d = tmp_path_factory.mktemp("latgen_variants")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=3)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav,
                  comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=4, totgauss=24,
                                       realign_iters=(1, 2, 3)))
    kaldi_io.write_kaldi_object(sys_.tm.write, f"{d}/trans.mdl")
    g_real = unigram_g(lang)
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, make_hclg(sys_, g_real))
    # flat G (zero weights, same labels): HCL := HCLG(flat);
    # HCL o G_real must decode like HCLG(G_real)
    g_flat = VectorFst(TropicalWeight)
    s = g_flat.add_state()
    g_flat.set_start(s)
    g_flat.set_final(s)
    for w in ("YES", "NO"):
        wid = lang.words[w]
        g_flat.add_arc(s, Arc(wid, wid, 0.0, s))
    with open(f"{d}/HCL.fst", "wb") as f:
        write_fst(f, make_hclg(sys_, g_flat))
    with open(f"{d}/G.fst", "wb") as f:
        write_fst(f, g_real)
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(sf):
            w.write(u, sf[u])
    # xconfig checkpoint dir with RANDOM params: the variants must
    # agree with the base tool on identical loglikes; accuracy is not
    # under test here
    model = build_xconfig_model(
        XCONFIG, {"num_targets": sys_.tm.num_pdfs}, train=False)
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(7),
                           {"input": jnp.zeros((1, 21, 13))})
    nnet_dir = f"{d}/nnet"
    os.makedirs(nnet_dir, exist_ok=True)
    save_checkpoint(nnet_dir, variables, 0, extra={
        "xconfig": XCONFIG.replace(
            "$num_targets", str(sys_.tm.num_pdfs))})
    return dict(d=str(d), ntest=len(sf))


def _words(path):
    return {k: list(v) for k, v in
            SequentialTableReader("int-vector", f"ark:{path}")}


@pytest.fixture(scope="module")
def base_words(env, tmp_path_factory):
    d = env["d"]
    t = tmp_path_factory.mktemp("base")
    run("nnet3-latgen-faster", "--acoustic-scale=1.0", "--beam=16",
        f"{d}/trans.mdl", f"{d}/nnet", f"{d}/HCLG.fst",
        f"ark:{d}/feats.ark", f"ark:{t}/lat.ark", f"ark:{t}/w.ark")
    w = _words(f"{t}/w.ark")
    assert len(w) == env["ntest"]
    return w


def test_looped_matches_base(env, base_words, tmp_path):
    d = env["d"]
    run("nnet3-latgen-faster-looped", "--acoustic-scale=1.0",
        "--beam=16", "--frames-per-chunk=17",
        "--extra-left-context=10", "--extra-right-context=10",
        f"{d}/trans.mdl", f"{d}/nnet", f"{d}/HCLG.fst",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/lat.ark",
        f"ark:{tmp_path}/w.ark")
    assert _words(f"{tmp_path}/w.ark") == base_words


def test_batch_matches_base(env, base_words, tmp_path):
    d = env["d"]
    run("nnet3-latgen-faster-batch", "--acoustic-scale=1.0",
        "--beam=16", "--minibatch-size=2",
        f"{d}/trans.mdl", f"{d}/nnet", f"{d}/HCLG.fst",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/lat.ark",
        f"ark:{tmp_path}/w.ark")
    assert _words(f"{tmp_path}/w.ark") == base_words


def test_lookahead_matches_base(env, base_words, tmp_path):
    d = env["d"]
    run("nnet3-latgen-faster-lookahead", "--acoustic-scale=1.0",
        "--beam=16",
        f"{d}/trans.mdl", f"{d}/nnet", f"{d}/HCL.fst", f"{d}/G.fst",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/lat.ark",
        f"ark:{tmp_path}/w.ark")
    assert _words(f"{tmp_path}/w.ark") == base_words


def test_looped_parallel_matches_base(env, base_words, tmp_path):
    d = env["d"]
    run("nnet3-latgen-faster-looped-parallel", "--acoustic-scale=1.0",
        "--beam=16", "--num-threads=3", "--frames-per-chunk=17",
        "--extra-left-context=10", "--extra-right-context=10",
        f"{d}/trans.mdl", f"{d}/nnet", f"{d}/HCLG.fst",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/lat.ark",
        f"ark:{tmp_path}/w.ark")
    assert _words(f"{tmp_path}/w.ark") == base_words


def test_looped_parallel_single_thread_delegates(env, base_words,
                                                 tmp_path):
    d = env["d"]
    run("nnet3-latgen-faster-looped-parallel", "--acoustic-scale=1.0",
        "--beam=16", "--num-threads=1", "--frames-per-chunk=17",
        "--extra-left-context=10", "--extra-right-context=10",
        f"{d}/trans.mdl", f"{d}/nnet", f"{d}/HCLG.fst",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/lat.ark",
        f"ark:{tmp_path}/w.ark")
    assert _words(f"{tmp_path}/w.ark") == base_words
