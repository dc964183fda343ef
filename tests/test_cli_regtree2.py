"""Regression-tree adaptation CLI: posterior-based fMLLR/MLLR
estimation and the regtree decode/latgen tools. Key invariants:
identity transforms decode identically to the plain decoder, and
adapted transforms do not hurt the aligned-path likelihood."""

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
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        make_hclg, train_mono)
    d = tmp_path_factory.mktemp("regtree2")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=2)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
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
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, make_hclg(sys_, unigram_g(lang)))
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    with TableWriter("matrix", f"ark:{d}/test_feats.ark") as w:
        for u in sorted(sf):
            w.write(u, sf[u])
    with TableWriter("int-vector", f"ark:{d}/ali.ark") as w:
        for u in sorted(ali):
            w.write(u, np.asarray(ali[u], np.int32))
    assert get_tool("ali-to-post")([
        "ali-to-post", f"ark:{d}/ali.ark", f"ark:{d}/post.ark"]) == 0
    assert get_tool("gmm-make-regtree")([
        "gmm-make-regtree", "--max-leaves=4", f"{d}/final.mdl",
        f"{d}/regtree"]) == 0
    utts = sorted(tf)
    with open(f"{d}/spk2utt", "w") as f:
        f.write("spk " + " ".join(utts) + "\n")
    with open(f"{d}/utt2spk_test", "w") as f:
        for u in sorted(sf):
            f.write(f"{u} spk\n")
    return dict(d=str(d), sys=sys_, tf=tf, sf=sf, ali=ali, lang=lang,
                test_txt=test_txt)


def test_est_regtree_fmllr_and_decode(env, tmp_path):
    d = env["d"]
    assert get_tool("gmm-est-regtree-fmllr")([
        "gmm-est-regtree-fmllr", f"--spk2utt=ark,t:{d}/spk2utt",
        "--min-count=100", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/post.ark", f"{d}/regtree",
        f"ark:{tmp_path}/xf.ark"]) == 0
    from kaldi_tpu.transform.regtree_fmllr import (RegtreeFmllr,
                                                   regtree_log_likes)
    xfs = dict(SequentialTableReader(RegtreeFmllr,
                                     f"ark:{tmp_path}/xf.ark"))
    assert set(xfs) == {"spk"}
    # adaptation does not hurt aligned-path likelihood on train data
    sys_ = env["sys"]
    from kaldi_tpu.cli.tail8_tools import _read_regtree
    from kaldi_tpu.base import io_funcs as iof
    with kaldi_io.input_stream(f"{d}/regtree") as f:
        tree = _read_regtree(f, iof.init_input_stream(f))
    # fMLLR maximizes loglike + log|det A| (the Jacobian term is
    # inside regtree_log_likes, as in the reference decodable),
    # summed over the speaker's data
    tot0 = tot1 = 0.0
    for u in sorted(env["tf"]):
        pdfs = sys_.tm.transition_ids_to_pdfs(env["ali"][u])
        t = np.arange(len(pdfs))
        tot0 += sys_.am.log_likes_batch(env["tf"][u])[t, pdfs].sum()
        tot1 += regtree_log_likes(
            sys_.am, tree, xfs["spk"], env["tf"][u])[t, pdfs].sum()
    assert tot1 > tot0 - 1e-3
    # decode the test set through the adapted models
    assert get_tool("gmm-decode-faster-regtree-fmllr")([
        "gmm-decode-faster-regtree-fmllr", "--acoustic-scale=0.1",
        "--beam=16", f"--utt2spk=ark,t:{d}/utt2spk_test",
        f"{d}/final.mdl", f"{d}/HCLG.fst", f"{d}/regtree",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/xf.ark",
        f"ark:{tmp_path}/words.ark"]) == 0
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words.ark"))
    lang = env["lang"]
    for u2, ref in env["test_txt"].items():
        hyp = [lang.word_names[w] for w in words.get(u2, [])]
        assert hyp == list(ref), (u2, hyp, ref)
    # latgen variant agrees on the best path
    assert get_tool("gmm-latgen-faster-regtree-fmllr")([
        "gmm-latgen-faster-regtree-fmllr", "--acoustic-scale=0.1",
        "--beam=16", f"--utt2spk=ark,t:{d}/utt2spk_test",
        f"{d}/final.mdl", f"{d}/HCLG.fst", f"{d}/regtree",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/xf.ark",
        f"ark:{tmp_path}/lat.ark"]) == 0
    from kaldi_tpu.lat.functions import lattice_best_path
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    lats = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{tmp_path}/lat.ark"))
    for u2 in words:
        _a, w2, _c = lattice_best_path(lats[u2])
        np.testing.assert_array_equal(w2, words[u2])


def test_est_regtree_mllr_and_decode(env, tmp_path):
    d = env["d"]
    assert get_tool("gmm-est-regtree-mllr")([
        "gmm-est-regtree-mllr", f"--spk2utt=ark,t:{d}/spk2utt",
        "--min-count=100", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/post.ark", f"{d}/regtree",
        f"ark:{tmp_path}/mllr.ark"]) == 0
    from kaldi_tpu.transform.regtree_mllr import (RegtreeMllr,
                                                  regtree_mllr_log_likes)
    xfs = dict(SequentialTableReader(RegtreeMllr,
                                     f"ark:{tmp_path}/mllr.ark"))
    assert set(xfs) == {"spk"}
    sys_ = env["sys"]
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.cli.tail8_tools import _read_regtree
    with kaldi_io.input_stream(f"{d}/regtree") as f:
        tree = _read_regtree(f, iof.init_input_stream(f))
    # MLLR re-estimated on the training data improves (or preserves)
    # the aligned-path likelihood, summed over utterances
    tot0 = tot1 = 0.0
    for u in sorted(env["tf"]):
        pdfs = sys_.tm.transition_ids_to_pdfs(env["ali"][u])
        t = np.arange(len(pdfs))
        tot0 += sys_.am.log_likes_batch(env["tf"][u])[t, pdfs].sum()
        tot1 += regtree_mllr_log_likes(
            sys_.am, tree, xfs["spk"], env["tf"][u])[t, pdfs].sum()
    assert tot1 > tot0 - 1e-3
    # identity MLLR decodes identically to the plain decoder
    D = sys_.am.dim
    eye = np.concatenate([np.eye(D), np.zeros((D, 1))],
                         axis=1)[None].repeat(1, axis=0)
    ident = RegtreeMllr(eye, [0] * tree.num_baseclasses)
    with TableWriter(RegtreeMllr, f"ark:{tmp_path}/ident.ark") as w:
        w.write("spk", ident)
    assert get_tool("gmm-decode-faster-regtree-mllr")([
        "gmm-decode-faster-regtree-mllr", "--acoustic-scale=0.1",
        "--beam=16", f"--utt2spk=ark,t:{d}/utt2spk_test",
        f"{d}/final.mdl", f"{d}/HCLG.fst", f"{d}/regtree",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/ident.ark",
        f"ark:{tmp_path}/words_id.ark"]) == 0
    assert get_tool("gmm-decode-faster")([
        "gmm-decode-faster", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/final.mdl", f"{d}/HCLG.fst",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/words_pl.ark"]) == 0
    wi = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/words_id.ark"))
    wp = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/words_pl.ark"))
    assert set(wi) == set(wp)
    for k in wi:
        np.testing.assert_array_equal(wi[k], wp[k])
    # adapted decode still gets the transcripts right
    assert get_tool("gmm-decode-faster-regtree-mllr")([
        "gmm-decode-faster-regtree-mllr", "--acoustic-scale=0.1",
        "--beam=16", f"--utt2spk=ark,t:{d}/utt2spk_test",
        f"{d}/final.mdl", f"{d}/HCLG.fst", f"{d}/regtree",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/mllr.ark",
        f"ark:{tmp_path}/words_ad.ark"]) == 0
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words_ad.ark"))
    lang = env["lang"]
    for u2, ref in env["test_txt"].items():
        hyp = [lang.word_names[w] for w in words.get(u2, [])]
        assert hyp == list(ref), (u2, hyp, ref)
