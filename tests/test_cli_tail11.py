"""Round-3 CLI tail batch 9: MAP estimation, soft-posterior stats,
graph-free decode/align, mean transforms, transition training,
posterior pasting, n-gram lattice expansion."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import (Lang, TrainingGraphCompiler,
                                         make_lexicon_fst)
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        make_hclg, train_mono)
    d = tmp_path_factory.mktemp("tail11")
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
    kaldi_io.write_kaldi_object(sys_.tree.write, f"{d}/tree")
    with open(f"{d}/L.fst", "wb") as f:
        write_fst(f, make_lexicon_fst(lang, with_disambig=True))
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
    with TableWriter("int-vector", f"ark:{d}/trans.ark") as w:
        for u in sorted(tf):
            w.write(u, np.asarray([lang.words[w_] for w_ in
                                   train_txt[u]], np.int32))
    return dict(d=str(d), sys=sys_, tf=tf, ali=ali, lang=lang,
                test_txt=test_txt, train_txt=train_txt)


def test_acc_stats_and_est_map(env, tmp_path):
    d = env["d"]
    rc = get_tool("ali-to-post")([
        "ali-to-post", f"ark:{d}/ali.ark", f"ark:{tmp_path}/post.ark"])
    assert rc == 0
    rc = get_tool("gmm-acc-stats")([
        "gmm-acc-stats", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/post.ark", f"{tmp_path}/stats.acc"])
    assert rc == 0
    # soft-posterior stats with weight-1 posts == ali stats
    rc = get_tool("gmm-acc-stats-ali")([
        "gmm-acc-stats-ali", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/ali.ark", f"{tmp_path}/stats_ali.acc"])
    assert rc == 0
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    a = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read,
                                   f"{tmp_path}/stats.acc")
    b = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read,
                                   f"{tmp_path}/stats_ali.acc")
    assert a.total_frames == pytest.approx(b.total_frames)
    rc = get_tool("gmm-est-map")([
        "gmm-est-map", "--mean-tau=5", f"{d}/final.mdl",
        f"{tmp_path}/stats.acc", f"{tmp_path}/map.mdl"])
    assert rc == 0
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    tm, am0 = read_am_gmm(f"{d}/final.mdl")
    tm2, am2 = read_am_gmm(f"{tmp_path}/map.mdl")
    # aligned-path likelihood does not degrade under MAP re-estimation
    u = sorted(env["tf"])[0]
    pdfs = tm.transition_ids_to_pdfs(env["ali"][u])
    t = np.arange(len(pdfs))
    ll0 = am0.log_likes_batch(env["tf"][u])[t, pdfs].mean()
    ll2 = am2.log_likes_batch(env["tf"][u])[t, pdfs].mean()
    assert ll2 > ll0 - 1e-3


def test_decode_faster_and_align(env, tmp_path):
    d = env["d"]
    rc = get_tool("gmm-decode-faster")([
        "gmm-decode-faster", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/final.mdl", f"{d}/HCLG.fst", f"ark:{d}/test_feats.ark",
        f"ark:{tmp_path}/words.ark"])
    assert rc == 0
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words.ark"))
    lang = env["lang"]
    errs = tot = 0
    for u, ref in env["test_txt"].items():
        hyp = [lang.word_names[w] for w in words.get(u, [])]
        tot += 1
        errs += int(hyp != list(ref))
    assert errs == 0, (errs, tot)
    # gmm-align from transcripts + L.fst reproduces the fixture's
    # alignments
    rc = get_tool("gmm-align")([
        "gmm-align", "--acoustic-scale=0.1", f"{d}/tree",
        f"{d}/final.mdl", f"{d}/L.fst", f"ark:{d}/feats.ark",
        f"ark:{d}/trans.ark", f"ark:{tmp_path}/ali2.ark"])
    assert rc == 0
    ali2 = dict(SequentialTableReader("int-vector",
                                      f"ark:{tmp_path}/ali2.ark"))
    assert len(ali2) == len(env["ali"])
    sys_ = env["sys"]
    for u, a in env["ali"].items():
        p1 = sys_.tm.transition_ids_to_pdfs(a)
        p2 = sys_.tm.transition_ids_to_pdfs(ali2[u])
        assert (np.asarray(p1) == np.asarray(p2)).mean() > 0.9


def test_transform_means(env, tmp_path):
    d = env["d"]
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    tm, am = read_am_gmm(f"{d}/final.mdl")
    D = am.dim
    A = np.concatenate([2.0 * np.eye(D), np.ones((D, 1))], axis=1)
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, A), f"{tmp_path}/A")
    rc = get_tool("gmm-transform-means")([
        "gmm-transform-means", f"{tmp_path}/A", f"{d}/final.mdl",
        f"{tmp_path}/t.mdl"])
    assert rc == 0
    tm2, am2 = read_am_gmm(f"{tmp_path}/t.mdl")
    np.testing.assert_allclose(am2.get_pdf(0).get_means(),
                               2.0 * am.get_pdf(0).get_means() + 1.0,
                               rtol=1e-4, atol=1e-3)


def test_train_transitions(env, tmp_path):
    d = env["d"]
    rc = get_tool("train-transitions")([
        "train-transitions", f"{d}/final.mdl", f"ark:{d}/ali.ark",
        f"{tmp_path}/tt.mdl"])
    assert rc == 0
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    tm0, am0 = read_am_gmm(f"{d}/final.mdl")
    tm1, am1 = read_am_gmm(f"{tmp_path}/tt.mdl")
    # AM preserved byte-for-byte in behavior; transitions re-fit to
    # the alignment counts (self-loop probs match observed rates)
    x = next(iter(env["tf"].values()))[:5]
    np.testing.assert_allclose(am1.log_likes_batch(x),
                               am0.log_likes_batch(x), atol=1e-4)
    stats = np.zeros(tm0.num_transition_ids + 1)
    for a in env["ali"].values():
        np.add.at(stats, np.asarray(a), 1.0)
    for ts in range(1, tm1.num_transition_states + 1):
        sl = tm1.self_loop_of(ts)
        if sl == 0:
            continue
        lo, hi = tm1.state2id[ts], tm1.state2id[ts + 1]
        tot = stats[lo:hi].sum()
        if tot < 5:
            continue
        import math
        want = max(stats[sl] / tot, 0.01)
        got = math.exp(tm1.get_transition_log_prob(sl))
        assert abs(got - want / max(
            sum(max(stats[i] / tot, 0.01) for i in range(lo, hi)),
            1e-9)) < 0.05


def test_paste_post(tmp_path):
    with TableWriter("posterior", f"ark:{tmp_path}/a.ark") as w:
        w.write("u1", [[(0, 0.5)], [(2, 1.0)]])
    with TableWriter("posterior", f"ark:{tmp_path}/b.ark") as w:
        w.write("u1", [[(1, 0.25)], []])
    rc = get_tool("paste-post")([
        "paste-post", f"ark:{tmp_path}/a.ark", "3",
        f"ark:{tmp_path}/b.ark", "2", f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("posterior",
                                     f"ark:{tmp_path}/o.ark"))["u1"]
    assert out[0] == [(0, 0.5), (4, 0.25)]
    assert out[1] == [(2, 1.0)]


def test_lattice_expand_ngram(tmp_path):
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    from kaldi_tpu.lat.functions import lattice_nbest
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    # diamond: two word histories merge into one state then continue
    lat = VectorFst(LatticeWeight)
    s = [lat.add_state() for _ in range(4)]
    lat.set_start(s[0])
    lat.add_arc(s[0], Arc(1, 5, (0.0, 0.0), s[2]))
    lat.add_arc(s[0], Arc(2, 6, (1.0, 0.0), s[2]))
    lat.add_arc(s[2], Arc(3, 7, (0.0, 0.0), s[3]))
    lat.set_final(s[3], (0.0, 0.0))
    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/l.ark") as w:
        w.write("u1", lat)
    rc = get_tool("lattice-expand-ngram")([
        "lattice-expand-ngram", "--n=3", f"ark:{tmp_path}/l.ark",
        f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = dict(SequentialTableReader(LatticeHolder(),
                                     f"ark:{tmp_path}/o.ark"))["u1"]
    # merged state splits by history: more states, same path set
    assert out.num_states > lat.num_states
    p_in = sorted((tuple(p[1]), round(p[2], 4))
                  for p in lattice_nbest(lat, 5))
    p_out = sorted((tuple(p[1]), round(p[2], 4))
                   for p in lattice_nbest(out, 5))
    assert p_in == p_out
