"""Round-3 CLI tail batch 12: post/feature utilities (append-post,
online CMVN, matrix-max, post-to-smat, pitch post-processing,
two-channel CMVN, sphinx export) and the generic mapped decoders
(decode-faster, align-mapped)."""

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
    from kaldi_tpu.decoder.graph import (Lang, TrainingGraphCompiler,
                                         make_lexicon_fst)
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        make_hclg, train_mono)
    d = tmp_path_factory.mktemp("tail14")
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
    return dict(d=str(d), sys=sys_, tf=tf, sf=sf, ali=ali, lang=lang,
                test_txt=test_txt)


def test_append_post_to_feats(env, tmp_path):
    d = env["d"]
    assert get_tool("ali-to-post")([
        "ali-to-post", f"ark:{d}/ali.ark",
        f"ark:{tmp_path}/post.ark"]) == 0
    ntid = env["sys"].tm.num_transition_ids
    assert get_tool("append-post-to-feats")([
        "append-post-to-feats", f"--post-dim={ntid + 1}",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/post.ark",
        f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/out.ark"))
    u = sorted(env["tf"])[0]
    feats = env["tf"][u]
    got = out[u]
    assert got.shape == (feats.shape[0], feats.shape[1] + ntid + 1)
    np.testing.assert_allclose(got[:, :feats.shape[1]], feats,
                               rtol=1e-5, atol=1e-5)
    # each appended row is one-hot at the aligned transition-id
    tail = got[:, feats.shape[1]:]
    assert np.allclose(tail.sum(axis=1), 1.0)
    hot = tail.argmax(axis=1)
    np.testing.assert_array_equal(hot, np.asarray(env["ali"][u]))


def test_apply_cmvn_online(env, tmp_path):
    d = env["d"]
    from kaldi_tpu.feat.functions import acc_cmvn_stats
    allx = np.concatenate(list(env["tf"].values()))
    stats = acc_cmvn_stats(allx)
    kaldi_io.write_kaldi_object(
        lambda s, b: __import__("kaldi_tpu.base.io_funcs",
                                fromlist=["x"]).write_matrix(s, b, stats),
        f"{tmp_path}/global.mat")
    assert get_tool("apply-cmvn-online")([
        "apply-cmvn-online", f"{tmp_path}/global.mat",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/norm.ark"]) == 0
    norm = dict(SequentialTableReader("matrix",
                                      f"ark:{tmp_path}/norm.ark"))
    assert set(norm) == set(env["tf"])
    u = sorted(env["tf"])[0]
    raw, nrm = env["tf"][u], norm[u]
    assert nrm.shape == raw.shape
    # frame 0 is normalized by (mostly) global stats: close to
    # raw - global_mean
    gmean = stats[0, :-1] / stats[0, -1]
    np.testing.assert_allclose(nrm[0], raw[0] - gmean, atol=2.0)
    assert not np.allclose(nrm, raw)
    # speaker mode primes later utterances and runs clean
    utts = sorted(env["tf"])
    with open(f"{tmp_path}/spk2utt", "w") as f:
        f.write("spk " + " ".join(utts) + "\n")
    assert get_tool("apply-cmvn-online")([
        "apply-cmvn-online", f"--spk2utt=ark,t:{tmp_path}/spk2utt",
        f"{tmp_path}/global.mat", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/norm2.ark"]) == 0
    norm2 = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/norm2.ark"))
    # first utterance identical (no speaker history yet), later differ
    np.testing.assert_allclose(norm2[utts[0]], norm[utts[0]],
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(norm2[utts[-1]], norm[utts[-1]])


def test_matrix_max(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 3)).astype(np.float32)
    b = rng.normal(size=(4, 3)).astype(np.float32)
    with TableWriter("matrix", f"ark:{tmp_path}/m.ark") as w:
        w.write("u1", a)
        w.write("u2", b)
    with open(f"{tmp_path}/groups", "w") as f:
        f.write("g u1 u2\n")
    assert get_tool("matrix-max")([
        "matrix-max", f"ark,t:{tmp_path}/groups",
        f"ark:{tmp_path}/m.ark", f"ark:{tmp_path}/max.ark"]) == 0
    out = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/max.ark"))
    np.testing.assert_allclose(out["g"], np.maximum(a[:4], b),
                               rtol=1e-6)


def test_post_to_smat(tmp_path):
    from kaldi_tpu.hmm.posterior import PosteriorHolder
    post = [[(0, 0.5), (3, 0.5)], [(2, 1.0)], []]
    with TableWriter(PosteriorHolder(), f"ark:{tmp_path}/p.ark") as w:
        w.write("u", post)
    assert get_tool("post-to-smat")([
        "post-to-smat", "--dim=5", f"ark:{tmp_path}/p.ark",
        f"ark:{tmp_path}/s.ark"]) == 0
    smats = dict(SequentialTableReader("sparse-matrix",
                                       f"ark:{tmp_path}/s.ark"))
    dense = smats["u"].todense()
    want = np.zeros((3, 5), np.float32)
    want[0, 0] = want[0, 3] = 0.5
    want[1, 2] = 1.0
    np.testing.assert_allclose(dense, want)
    # out-of-range index is rejected
    assert get_tool("post-to-smat")([
        "post-to-smat", "--dim=2", f"ark:{tmp_path}/p.ark",
        f"ark:{tmp_path}/bad.ark"]) != 0


def test_sparse_matrix_text_roundtrip(tmp_path):
    from kaldi_tpu.matrix.sparse import SparseMatrix
    m = SparseMatrix(4, [(np.array([1, 3]), np.array([0.5, -2.0])),
                         (np.array([], np.int32), np.array([], np.float32))])
    for binary in (True, False):
        path = f"{tmp_path}/sm_{binary}"
        with open(path, "wb") as f:
            if binary:
                f.write(b"\0B")
            m.write(f, binary)
        with open(path, "rb") as f:
            from kaldi_tpu.base import io_funcs as iof
            b = iof.init_input_stream(f)
            m2 = SparseMatrix.read(f, b)
        np.testing.assert_allclose(m2.todense(), m.todense())


def test_process_pitch_feats(tmp_path):
    rng = np.random.default_rng(1)
    T = 200
    pov = rng.uniform(0.01, 0.99, size=T)
    pitch = rng.uniform(80, 300, size=T)
    feats = np.stack([pov, pitch], axis=1).astype(np.float32)
    short = feats[:40]
    with TableWriter("matrix", f"ark:{tmp_path}/p.ark") as w:
        w.write("long", feats)
        w.write("short", short)
    assert get_tool("process-pitch-feats")([
        "process-pitch-feats", f"ark:{tmp_path}/p.ark",
        f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/out.ark"))
    for key, src in (("long", feats), ("short", short)):
        got = out[key]
        p = src[:, 0].astype(np.float64)
        np.testing.assert_allclose(
            got[:, 0], np.log((p + 1e-4) / (1.0001 - p)), rtol=1e-4)
    # short utterance (T <= window): exact global log-mean subtraction,
    # then 5-frame smoothing over the interior
    lp = np.log(short[:, 1].astype(np.float64))
    centered = lp - lp.mean()
    sm = centered.copy()
    for i in range(2, len(sm) - 2):
        sm[i] = centered[i - 2:i + 3].mean()
    np.testing.assert_allclose(out["short"][:, 1], sm, atol=1e-4)
    # long utterance: moving-window normalization keeps values near 0
    assert abs(out["long"][:, 1]).mean() < abs(
        np.log(feats[:, 1])).mean()


def test_compute_cmvn_stats_two_channel(tmp_path):
    rng = np.random.default_rng(2)
    T, D = 50, 4
    fa = rng.normal(size=(T, D)).astype(np.float32)
    fb = rng.normal(size=(T, D)).astype(np.float32)
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("call1-A", fa)
        w.write("call1-B", fb)
        w.write("call2-A", fa[:30])
    with open(f"{tmp_path}/reco2fc", "w") as f:
        f.write("call1-A call1 A\ncall1-B call1 B\ncall2-A call2 A\n")
    assert get_tool("compute-cmvn-stats-two-channel")([
        "compute-cmvn-stats-two-channel", f"{tmp_path}/reco2fc",
        f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/stats.ark"]) == 0
    stats = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/stats.ark"))
    louder_a = fa[:, 0] > fb[:, 0]
    wa = np.where(louder_a, 1.0, 0.01)
    wb = np.where(louder_a, 0.01, 1.0)
    assert stats["call1-A"][0, D] == pytest.approx(wa.sum(), rel=1e-6)
    assert stats["call1-B"][0, D] == pytest.approx(wb.sum(), rel=1e-6)
    np.testing.assert_allclose(stats["call1-A"][0, :D],
                               (fa * wa[:, None]).sum(0), rtol=1e-5)
    # singleton: plain stats
    assert stats["call2-A"][0, D] == pytest.approx(30.0)


def test_copy_feats_to_sphinx(env, tmp_path):
    d = env["d"]
    assert get_tool("copy-feats-to-sphinx")([
        "copy-feats-to-sphinx", f"--output-dir={tmp_path}/sph",
        "--output-ext=fea", f"ark:{d}/feats.ark"]) == 0
    u = sorted(env["tf"])[0]
    raw = open(f"{tmp_path}/sph/{u}.fea", "rb").read()
    count = np.frombuffer(raw[:4], "<i4")[0]
    feats = env["tf"][u]
    assert count == feats.size
    data = np.frombuffer(raw[4:], "<f4").reshape(feats.shape)
    np.testing.assert_allclose(data, feats, rtol=1e-6)


def test_decode_faster_and_align_mapped(env, tmp_path):
    d = env["d"]
    sys_ = env["sys"]
    tm = sys_.tm
    # transition-id-indexed loglikes: column tid-1 = pdf loglike
    with TableWriter("matrix", f"ark:{tmp_path}/ll_tid.ark") as w:
        for u, feats in env["sf"].items():
            ll = sys_.am.log_likes_batch(feats)
            tid_ll = ll[:, [tm.transition_id_to_pdf(t)
                            for t in range(1, tm.num_transition_ids + 1)]]
            w.write(u, tid_ll.astype(np.float32))
    assert get_tool("decode-faster")([
        "decode-faster", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/HCLG.fst", f"ark:{tmp_path}/ll_tid.ark",
        f"ark:{tmp_path}/words.ark"]) == 0
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words.ark"))
    lang = env["lang"]
    for u, ref in env["test_txt"].items():
        hyp = [lang.word_names[w] for w in words.get(u, [])]
        assert hyp == list(ref), (u, hyp, ref)
    # align-mapped: pdf-indexed loglikes reproduce the GMM alignments
    with TableWriter("matrix", f"ark:{tmp_path}/ll_pdf.ark") as w:
        for u, feats in env["tf"].items():
            w.write(u, sys_.am.log_likes_batch(feats).astype(np.float32))
    assert get_tool("align-mapped")([
        "align-mapped", "--acoustic-scale=0.1",
        "--self-loop-scale=0.1", f"{d}/tree", f"{d}/final.mdl",
        f"{d}/L.fst", f"ark:{tmp_path}/ll_pdf.ark",
        f"ark:{d}/trans.ark", f"ark:{tmp_path}/ali.ark"]) == 0
    ali = dict(SequentialTableReader("int-vector",
                                     f"ark:{tmp_path}/ali.ark"))
    assert set(ali) == set(env["tf"])
    for u, a in env["ali"].items():
        p1 = tm.transition_ids_to_pdfs(a)
        p2 = tm.transition_ids_to_pdfs(ali[u])
        assert (np.asarray(p1) == np.asarray(p2)).mean() > 0.9
