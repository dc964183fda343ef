"""Round-3 CLI tail batch 3: posterior conversions, vector/matrix
utilities, VAD ops, GMM MAP/likes/rescoring, ivector-extractor
ladder (parity: src/bin, src/gmmbin, src/ivectorbin)."""

import numpy as np
import pytest

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def read_vecs(path):
    return dict(SequentialTableReader("vector", f"ark:{path}"))


def test_prob_and_logprob_to_post(tmp_path):
    probs = np.array([[0.7, 0.25, 0.05], [0.0, 1.0, 0.0]])
    with TableWriter("matrix", f"ark:{tmp_path}/p.ark") as w:
        w.write("u1", probs)
    rc = get_tool("prob-to-post")([
        "prob-to-post", "--min-post=0.1", "--random-prune=false",
        f"ark:{tmp_path}/p.ark", f"ark:{tmp_path}/post.ark"])
    assert rc == 0
    post = dict(SequentialTableReader("posterior",
                                      f"ark:{tmp_path}/post.ark"))["u1"]
    assert [p[0] for p in post[0]] == [0, 1]
    assert post[1] == [(1, 1.0)]
    with TableWriter("matrix", f"ark:{tmp_path}/lp.ark") as w:
        w.write("u1", np.log(np.maximum(probs, 1e-30)))
    rc = get_tool("logprob-to-post")([
        "logprob-to-post", "--min-post=0.1", "--random-prune=false",
        f"ark:{tmp_path}/lp.ark", f"ark:{tmp_path}/post2.ark"])
    assert rc == 0
    post2 = dict(SequentialTableReader("posterior",
                                      f"ark:{tmp_path}/post2.ark"))["u1"]
    assert post2[0][0][0] == 0
    assert post2[0][0][1] == pytest.approx(0.7, abs=1e-5)


def test_feat_to_post_topn(tmp_path):
    feats = np.array([[0.1, 0.9, 0.5]])
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", feats)
    rc = get_tool("feat-to-post")([
        "feat-to-post", "--top-n=2", f"ark:{tmp_path}/f.ark",
        f"ark:{tmp_path}/post.ark"])
    assert rc == 0
    post = dict(SequentialTableReader("posterior",
                                      f"ark:{tmp_path}/post.ark"))["u1"]
    assert [p[0] for p in post[0]] == [1, 2]


def test_get_post_on_ali_and_tacc(tmp_path):
    post = [[(3, 0.6), (4, 0.4)], [(4, 1.0)]]
    with TableWriter("posterior", f"ark:{tmp_path}/p.ark") as w:
        w.write("u1", post)
    with TableWriter("int-vector", f"ark:{tmp_path}/ali.ark") as w:
        w.write("u1", np.asarray([3, 3], np.int32))
    rc = get_tool("get-post-on-ali")([
        "get-post-on-ali", f"ark:{tmp_path}/p.ark",
        f"ark:{tmp_path}/ali.ark", f"ark:{tmp_path}/c.ark"])
    assert rc == 0
    conf = read_vecs(f"{tmp_path}/c.ark")["u1"]
    np.testing.assert_allclose(conf, [0.6, 0.0], atol=1e-6)
    rc = get_tool("post-to-tacc")([
        "post-to-tacc", f"ark:{tmp_path}/p.ark", f"{tmp_path}/tacc"])
    assert rc == 0
    acc = kaldi_io.read_kaldi_object(iof.read_vector, f"{tmp_path}/tacc")
    np.testing.assert_allclose(acc, [0, 0, 0, 0.6, 1.4], atol=1e-6)


def test_vector_matrix_utils(tmp_path):
    with TableWriter("matrix", f"ark:{tmp_path}/m.ark") as w:
        w.write("u1", np.array([[1.0, 2.0], [3.0, 4.0]]))
    rc = get_tool("matrix-sum-rows")([
        "matrix-sum-rows", f"ark:{tmp_path}/m.ark",
        f"ark:{tmp_path}/v.ark"])
    assert rc == 0
    np.testing.assert_allclose(read_vecs(f"{tmp_path}/v.ark")["u1"],
                               [4.0, 6.0])
    m = np.array([[1.0, 1.0]])
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, m), f"{tmp_path}/m1")
    rc = get_tool("sum-matrices")([
        "sum-matrices", f"{tmp_path}/msum", f"{tmp_path}/m1",
        f"{tmp_path}/m1"])
    assert rc == 0
    tot = kaldi_io.read_kaldi_object(iof.read_matrix, f"{tmp_path}/msum")
    np.testing.assert_allclose(tot, [[2.0, 2.0]])
    with TableWriter("vector", f"ark:{tmp_path}/a.ark") as w:
        w.write("u1", np.array([1.0, 2.0]))
    with TableWriter("vector", f"ark:{tmp_path}/b.ark") as w:
        w.write("u1", np.array([3.0, 0.5]))
    rc = get_tool("paste-vectors")([
        "paste-vectors", f"ark:{tmp_path}/a.ark",
        f"ark:{tmp_path}/b.ark", f"ark:{tmp_path}/ab.ark"])
    assert rc == 0
    np.testing.assert_allclose(read_vecs(f"{tmp_path}/ab.ark")["u1"],
                               [1, 2, 3, 0.5])
    rc = get_tool("multiply-vectors")([
        "multiply-vectors", f"ark:{tmp_path}/a.ark",
        f"ark:{tmp_path}/b.ark", f"ark:{tmp_path}/prod.ark"])
    assert rc == 0
    np.testing.assert_allclose(read_vecs(f"{tmp_path}/prod.ark")["u1"],
                               [3.0, 1.0])
    # transform-vec: linear and affine
    lin = np.array([[0.0, 1.0], [1.0, 0.0]])
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, lin), f"{tmp_path}/lin")
    rc = get_tool("transform-vec")([
        "transform-vec", f"{tmp_path}/lin", f"ark:{tmp_path}/a.ark",
        f"ark:{tmp_path}/t.ark"])
    assert rc == 0
    np.testing.assert_allclose(read_vecs(f"{tmp_path}/t.ark")["u1"],
                               [2.0, 1.0])
    aff = np.array([[1.0, 0.0, 10.0], [0.0, 1.0, -1.0]])
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, aff), f"{tmp_path}/aff")
    rc = get_tool("ivector-transform")([
        "ivector-transform", f"{tmp_path}/aff", f"ark:{tmp_path}/a.ark",
        f"ark:{tmp_path}/t2.ark"])
    assert rc == 0
    np.testing.assert_allclose(read_vecs(f"{tmp_path}/t2.ark")["u1"],
                               [11.0, 1.0])


def test_compare_int_vector_and_analyze_counts(tmp_path, capsys):
    with TableWriter("int-vector", f"ark:{tmp_path}/a.ark") as w:
        w.write("u1", np.asarray([1, 2, 3], np.int32))
    with TableWriter("int-vector", f"ark:{tmp_path}/b.ark") as w:
        w.write("u1", np.asarray([1, 2, 4], np.int32))
    rc = get_tool("compare-int-vector")([
        "compare-int-vector", f"ark:{tmp_path}/a.ark",
        f"ark:{tmp_path}/b.ark"])
    assert rc == 0
    assert "1/3" in capsys.readouterr().out
    rc = get_tool("analyze-counts")([
        "analyze-counts", f"ark:{tmp_path}/a.ark", f"{tmp_path}/cnt"])
    assert rc == 0
    acc = kaldi_io.read_kaldi_object(iof.read_vector, f"{tmp_path}/cnt")
    np.testing.assert_allclose(acc, [0, 1, 1, 1])


def test_vad_ops(tmp_path):
    feats = np.arange(12, dtype=np.float64).reshape(4, 3)
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", feats)
    with TableWriter("vector", f"ark:{tmp_path}/v1.ark") as w:
        w.write("u1", np.array([1.0, 0.0, 1.0, 1.0]))
    with TableWriter("vector", f"ark:{tmp_path}/v2.ark") as w:
        w.write("u1", np.array([1.0, 1.0, 0.0, 1.0]))
    rc = get_tool("select-voiced-frames")([
        "select-voiced-frames", f"ark:{tmp_path}/f.ark",
        f"ark:{tmp_path}/v1.ark", f"ark:{tmp_path}/sel.ark"])
    assert rc == 0
    sel = dict(SequentialTableReader("matrix",
                                     f"ark:{tmp_path}/sel.ark"))["u1"]
    np.testing.assert_allclose(sel, feats[[0, 2, 3]])
    rc = get_tool("merge-vads")([
        "merge-vads", f"ark:{tmp_path}/v1.ark", f"ark:{tmp_path}/v2.ark",
        f"ark:{tmp_path}/vm.ark"])
    assert rc == 0
    np.testing.assert_allclose(read_vecs(f"{tmp_path}/vm.ark")["u1"],
                               [1, 0, 0, 1])
    # frame-likes: class 1 wins on frames 1,3
    with TableWriter("vector", f"ark:{tmp_path}/l0.ark") as w:
        w.write("u1", np.array([0.0, -2.0, 0.0, -3.0]))
    with TableWriter("vector", f"ark:{tmp_path}/l1.ark") as w:
        w.write("u1", np.array([-1.0, 0.0, -1.0, 0.0]))
    rc = get_tool("compute-vad-from-frame-likes")([
        "compute-vad-from-frame-likes", f"ark:{tmp_path}/l0.ark",
        f"ark:{tmp_path}/l1.ark", f"ark:{tmp_path}/vad.ark"])
    assert rc == 0
    np.testing.assert_allclose(read_vecs(f"{tmp_path}/vad.ark")["u1"],
                               [0, 1, 0, 1])


@pytest.fixture(scope="module")
def gmm_env(tmp_path_factory):
    """Tiny mono system + feats/ali written as archives."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mono_e2e import FS, make_corpus
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        train_mono)
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    d = tmp_path_factory.mktemp("gmmtail")
    train_txt, train_wav, _, _ = make_corpus(num_train=6, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=3, totgauss=20,
                                       realign_iters=(1, 2)))
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
    return dict(d=str(d), sys=sys_, tf=tf)


def test_hmm_info_and_gmm_compute_likes(gmm_env, capsys):
    d = gmm_env["d"]
    rc = get_tool("hmm-info")(["hmm-info", f"{d}/final.mdl"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "number of pdfs" in out and "transition-ids" in out
    rc = get_tool("gmm-compute-likes")([
        "gmm-compute-likes", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/likes.ark"])
    assert rc == 0
    likes = dict(SequentialTableReader("matrix", f"ark:{d}/likes.ark"))
    sys_ = gmm_env["sys"]
    u = sorted(gmm_env["tf"])[0]
    ref = sys_.am.log_likes_batch(gmm_env["tf"][u])
    np.testing.assert_allclose(likes[u], ref, atol=1e-3)


def test_gmm_adapt_map(gmm_env):
    d = gmm_env["d"]
    # ali -> posterior (weight 1.0 on the aligned transition)
    ali = dict(SequentialTableReader("int-vector", f"ark:{d}/ali.ark"))
    with TableWriter("posterior", f"ark:{d}/post.ark") as w:
        for u, a in ali.items():
            w.write(u, [[(int(t), 1.0)] for t in a])
    rc = get_tool("gmm-adapt-map")([
        "gmm-adapt-map", "--mean-tau=5.0", f"{d}/final.mdl",
        f"ark:{d}/feats.ark", f"ark:{d}/post.ark",
        f"ark:{d}/map.ark"])
    assert rc == 0
    from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm
    from kaldi_tpu.util.table import ObjectHolder
    models = dict(SequentialTableReader(ObjectHolder(AmDiagGmm),
                                        f"ark:{d}/map.ark"))
    assert len(models) == len(ali)
    sys_ = gmm_env["sys"]
    u = sorted(models)[0]
    am2 = models[u]
    # adapted model differs from base but has the same structure
    assert am2.num_pdfs == sys_.am.num_pdfs
    diffs = [np.abs(am2.get_pdf(i).get_means()
                    - sys_.am.get_pdf(i).get_means()).max()
             for i in range(am2.num_pdfs)]
    assert max(diffs) > 1e-3
    # adapted model scores its own ALIGNED data better (that's the
    # quantity MAP adapts toward)
    ali_u = dict(SequentialTableReader("int-vector",
                                       f"ark:{d}/ali.ark"))[u]
    pdfs = sys_.tm.transition_ids_to_pdfs(ali_u)
    ll_base = sys_.am.log_likes_batch(gmm_env["tf"][u])
    ll_map = am2.log_likes_batch(gmm_env["tf"][u])
    t = np.arange(len(pdfs))
    assert ll_map[t, pdfs].mean() > ll_base[t, pdfs].mean()


def test_ivector_extractor_ladder(tmp_path):
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    rng = np.random.default_rng(0)
    D, G = 4, 3
    ubm = DiagGmm(G, D)
    means = rng.normal(scale=2.0, size=(G, D))
    ubm.set_from_means_and_vars(np.ones(G) / G, means, np.ones((G, D)))
    kaldi_io.write_kaldi_object(ubm.write, f"{tmp_path}/ubm")
    rc = get_tool("ivector-extractor-init")([
        "ivector-extractor-init", "--ivector-dim=3",
        f"{tmp_path}/ubm", f"{tmp_path}/0.ie"])
    assert rc == 0
    # speaker-shifted data
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        for i in range(6):
            shift = (i % 2) * 1.5
            x = means[rng.integers(0, G, 50)] + shift + \
                0.5 * rng.normal(size=(50, D))
            w.write(f"u{i}", x)
    rc = get_tool("ivector-extractor-acc-stats")([
        "ivector-extractor-acc-stats", f"{tmp_path}/0.ie",
        f"ark:{tmp_path}/feats.ark", f"{tmp_path}/0.acc"])
    assert rc == 0
    rc = get_tool("ivector-extractor-sum-accs")([
        "ivector-extractor-sum-accs", f"{tmp_path}/sum.acc",
        f"{tmp_path}/0.acc"])
    assert rc == 0
    rc = get_tool("ivector-extractor-est")([
        "ivector-extractor-est", f"{tmp_path}/0.ie",
        f"{tmp_path}/sum.acc", f"{tmp_path}/1.ie"])
    assert rc == 0
    rc = get_tool("ivector-extract")([
        "ivector-extract", f"{tmp_path}/1.ie",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/iv.ark"])
    assert rc == 0
    ivs = read_vecs(f"{tmp_path}/iv.ark")
    assert len(ivs) == 6
    # LDA over the two synthetic "speakers"
    with open(f"{tmp_path}/utt2spk", "w") as f:
        for i in range(6):
            f.write(f"u{i} spk{i % 2}\n")
    rc = get_tool("ivector-compute-lda")([
        "ivector-compute-lda", "--dim=2",
        f"ark:{tmp_path}/iv.ark", f"ark,t:{tmp_path}/utt2spk",
        f"{tmp_path}/lda.mat"])
    assert rc == 0
    mat = np.asarray(kaldi_io.read_kaldi_object(iof.read_matrix,
                                                f"{tmp_path}/lda.mat"))
    assert mat.shape[0] == 2


def test_decode_faster_mapped_and_rescore(gmm_env, tmp_path):
    d = gmm_env["d"]
    rc = get_tool("gmm-compute-likes")([
        "gmm-compute-likes", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/likes.ark"])
    assert rc == 0
    # graph: per-utterance training graphs would need lang; use the
    # lattice path instead — decode via gmm-latgen-faster then rescore
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mono_e2e import unigram_g
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import make_hclg
    sys_ = gmm_env["sys"]
    hclg = make_hclg(sys_, unigram_g(sys_.lang))
    with open(f"{tmp_path}/HCLG.fst", "wb") as f:
        write_fst(f, hclg)
    rc = get_tool("decode-faster-mapped")([
        "decode-faster-mapped", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/final.mdl", f"{tmp_path}/HCLG.fst",
        f"ark:{tmp_path}/likes.ark", f"ark:{tmp_path}/words.ark",
        f"ark:{tmp_path}/ali.ark"])
    assert rc == 0
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words.ark"))
    assert len(words) == len(gmm_env["tf"])
    # gmm-rescore-lattice: lattice through gmm-latgen-faster first
    rc = get_tool("gmm-latgen-faster")([
        "gmm-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/final.mdl", f"{tmp_path}/HCLG.fst", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/lat.ark"])
    assert rc == 0
    rc = get_tool("gmm-rescore-lattice")([
        "gmm-rescore-lattice", f"{d}/final.mdl",
        f"ark:{tmp_path}/lat.ark", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/rlat.ark"])
    assert rc == 0
    from kaldi_tpu.lat.functions import lattice_best_path
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    lats = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{tmp_path}/rlat.ark"))
    assert len(lats) == len(gmm_env["tf"])
    for k, lat in lats.items():
        ali, ws, cost = lattice_best_path(lat)
        assert np.isfinite(cost)
