"""nnet2 training stack: egs wire format (nnet-example.cc), batched
forward/backprop gradient correctness (nnet-update.cc), SGD +
preconditioned updates (nnet-precondition.cc), model combination
(combine-nnet.cc), surgery ops (nnet-fix.cc / mixup / widen), and the
nnet2bin CLI training workflow end-to-end on the yes/no corpus."""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.nnet2.egs import NnetExample, extract_egs
from kaldi_tpu.nnet2.model import (AffineComponent,
                                   AffineComponentPreconditioned,
                                   Nnet2, SoftmaxComponent,
                                   SpliceComponent, TanhComponent)
from kaldi_tpu.nnet2.train import (TrainStats, backprop, combine_nnets,
                                   compute_prob, forward_store,
                                   format_minibatch, get_params,
                                   objf_and_deriv, _precondition,
                                   set_params, train_simple,
                                   updatable_indices)


def _rng(seed=0):
    return np.random.RandomState(seed)


def _toy_net(din=5, dh=8, dout=4, ctx=(-1, 0, 1), seed=0,
             lr=0.02, precond=False):
    rng = _rng(seed)
    spliced = din * len(ctx)
    cls = AffineComponentPreconditioned if precond else AffineComponent
    kw1 = dict(LearningRate=lr,
               LinearParams=(rng.randn(dh, spliced) * 0.3).astype(
                   np.float32),
               BiasParams=np.zeros(dh, np.float32))
    kw2 = dict(LearningRate=lr,
               LinearParams=(rng.randn(dout, dh) * 0.3).astype(
                   np.float32),
               BiasParams=np.zeros(dout, np.float32))
    if precond:
        kw1.update(Alpha=4.0, MaxChange=0.0)
        kw2.update(Alpha=4.0, MaxChange=0.0)
    else:
        kw1.update(IsGradient=False)
        kw2.update(IsGradient=False)
    return Nnet2([
        SpliceComponent(InputDim=din, Context=list(ctx),
                        ConstComponentDim=0),
        cls(**kw1),
        TanhComponent(Dim=dh),
        cls(**kw2),
        SoftmaxComponent(Dim=dout),
    ])


def _toy_egs(nnet, n=60, din=5, dout=4, nf=1, seed=1):
    """Separable 2-class-ish data: label depends on sign of feature
    sum so SGD must be able to learn it."""
    rng = _rng(seed)
    lc, rc = nnet.left_context(), nnet.right_context()
    egs = []
    for _ in range(n):
        x = rng.randn(nf + lc + rc, din).astype(np.float32)
        labels = []
        for t in range(nf):
            s = float(x[t + lc].sum())
            labels.append([(int(abs(s) * 7) % dout if s > 0 else
                            (dout - 1 - int(abs(s) * 7) % dout), 1.0)])
        egs.append(NnetExample(labels, x, lc))
    return egs


# ---------------------------------------------------------------------------
# wire format


def test_egs_roundtrip_binary_and_text(tmp_path):
    rng = _rng(3)
    frames = rng.randn(5, 7).astype(np.float32)
    # Lab1 (simple) and Lab2 (weighted) variants
    simple = NnetExample([[(2, 1.0)], [(0, 1.0)], [(3, 1.0)]],
                         frames, 1, spk_info=np.array([0.5, -1.0],
                                                      np.float32))
    weighted = NnetExample([[(1, 0.25), (2, 0.75)], [(0, 1.0)],
                            [(3, 0.5)]], frames, 1)
    for eg, atol in ((simple, 2e-3), (weighted, 2e-3)):
        for binary in (True, False):
            buf = io.BytesIO()
            eg.write(buf, binary)
            buf.seek(0)
            back = NnetExample.read(buf, binary)
            assert back.left_context == 1
            assert [[(p, pytest.approx(w)) for p, w in f]
                    for f in back.labels] == \
                [[(p, pytest.approx(w)) for p, w in f]
                 for f in eg.labels]
            # binary path stores a CompressedMatrix (lossy)
            np.testing.assert_allclose(back.input_frames, frames,
                                       atol=atol if binary else 1e-6)
            np.testing.assert_allclose(back.spk_info, eg.spk_info,
                                       atol=1e-6)


def test_extract_egs_context_and_packing():
    T, D = 7, 6
    feats = np.arange(T * D, dtype=np.float32).reshape(T, D)
    post = [[(t % 3, 1.0)] for t in range(T)]
    egs = extract_egs(feats, post, left_context=2, right_context=1,
                      frames_per_eg=3)
    assert len(egs) == 3                      # 3 + 3 + 1 labeled frames
    assert egs[0].num_frames == 3 and egs[2].num_frames == 1
    # first eg: left context is edge-replicated frame 0
    np.testing.assert_array_equal(egs[0].input_frames[0], feats[0])
    np.testing.assert_array_equal(egs[0].input_frames[1], feats[0])
    np.testing.assert_array_equal(egs[0].input_frames[2], feats[0])
    np.testing.assert_array_equal(egs[0].input_frames[3], feats[1])
    # last eg: right context replicates the last frame
    np.testing.assert_array_equal(egs[2].input_frames[-1], feats[-1])
    # const_feat_dim goes to spk_info (averaged over the utterance)
    egs2 = extract_egs(feats, post, 1, 1, const_feat_dim=2)
    assert egs2[0].spk_info.shape == (2,)
    np.testing.assert_allclose(egs2[0].spk_info, feats[:, 4:].mean(0))
    assert egs2[0].input_frames.shape[1] == 4
    # zero-weight frames are dropped entirely
    w = np.ones(T, np.float32)
    w[0] = 0.0
    egs3 = extract_egs(feats, post, 0, 0, frame_weights=w)
    assert len(egs3) == T - 1


def test_subrange_truncates_context():
    frames = np.arange(10, dtype=np.float32).reshape(10, 1)
    eg = NnetExample([[(t, 1.0)] for t in range(6)], frames, 2)
    assert eg.right_context == 2
    sub = eg.subrange(2, 2, left_context=1, right_context=1)
    assert sub.num_frames == 2 and sub.left_context == 1
    # labeled frames 2,3 of the original, rows 3..7 of the padded mat
    np.testing.assert_array_equal(sub.input_frames[:, 0],
                                  [3.0, 4.0, 5.0, 6.0])
    assert sub.labels == [[(2, 1.0)], [(3, 1.0)]]


# ---------------------------------------------------------------------------
# math


def test_backprop_gradient_check():
    nnet = _toy_net()
    egs = _toy_egs(nnet, n=4, nf=2)
    x3, labels = format_minibatch(egs)
    acts = forward_store(nnet, x3)
    objf0, _, dy = objf_and_deriv(acts[-1], labels)
    _, grads = backprop(nnet, acts, dy)
    eps = 1e-4
    for i in updatable_indices(nnet):
        comp = nnet.components[i]
        W = np.asarray(comp.fields["LinearParams"])
        g = grads[i]["LinearParams"]
        rng = _rng(i)
        for _ in range(6):
            r, c = rng.randint(W.shape[0]), rng.randint(W.shape[1])
            Wp = W.copy()
            Wp[r, c] += eps
            comp.fields["LinearParams"] = Wp
            objf1, _, _ = objf_and_deriv(
                forward_store(nnet, x3)[-1], labels)
            comp.fields["LinearParams"] = W
            num = (objf1 - objf0) / eps
            assert num == pytest.approx(g[r, c], rel=5e-2, abs=2e-3)
        # bias gradient too
        b = np.asarray(comp.fields["BiasParams"])
        gb = grads[i]["BiasParams"]
        bp = b.copy()
        bp[0] += eps
        comp.fields["BiasParams"] = bp
        objf1, _, _ = objf_and_deriv(forward_store(nnet, x3)[-1],
                                     labels)
        comp.fields["BiasParams"] = b
        assert (objf1 - objf0) / eps == pytest.approx(gb[0], rel=5e-2,
                                                      abs=2e-3)


def test_precondition_preserves_norm():
    R = _rng(5).randn(16, 9).astype(np.float32)
    P = _precondition(R, alpha=4.0)
    assert np.linalg.norm(P) == pytest.approx(np.linalg.norm(R),
                                              rel=1e-5)
    assert not np.allclose(P, R)             # it does smooth directions
    np.testing.assert_array_equal(_precondition(R, 0.0), R)


@pytest.mark.parametrize("precond", [False, True])
def test_train_simple_learns(precond):
    nnet = _toy_net(precond=precond)
    egs = _toy_egs(nnet, n=300)
    before, wb = compute_prob(nnet, egs)
    stats = train_simple(nnet, iter(egs * 3), minibatch_size=32)
    after, wa = compute_prob(nnet, egs)
    assert stats.minibatches > 0
    assert after / wa > before / wb + 0.05   # objf (avg logprob) rises


def test_compute_prob_matches_train_stats():
    nnet = _toy_net(seed=2)
    egs = _toy_egs(nnet, n=40, seed=4)
    tot, w = compute_prob(nnet, egs)
    x3, labels = format_minibatch(egs)
    objf, w2, _ = objf_and_deriv(forward_store(nnet, x3)[-1], labels)
    assert tot == pytest.approx(objf, rel=1e-6)
    assert w == pytest.approx(w2)


def test_combine_nnets_beats_singles():
    base = _toy_net(seed=7)
    egs = _toy_egs(base, n=120, seed=8)
    nets = []
    for s in range(3):
        nn = _toy_net(seed=7)
        st = TrainStats()
        rng = _rng(10 + s)
        idx = rng.permutation(len(egs))[:60]
        from kaldi_tpu.nnet2.train import train_one_minibatch
        for i in range(0, 60, 20):
            train_one_minibatch(nn, [egs[j] for j in idx[i:i + 20]],
                                st)
        nets.append(nn)
    singles = [compute_prob(nn, egs) for nn in nets]
    best = max(t / w for t, w in singles)
    combined, objf = combine_nnets(nets, egs, num_iters=15)
    assert objf >= best - 1e-6
    # get/set params round trip
    i = updatable_indices(combined)[0]
    p = get_params(combined, i)
    set_params(combined, i, p)
    np.testing.assert_allclose(get_params(combined, i), p)


# ---------------------------------------------------------------------------
# surgery


def test_widen_preserves_old_units():
    from kaldi_tpu.nnet2.surgery import widen_nnet
    nnet = _toy_net(dh=8)
    x = _rng(1).randn(1, 3 + nnet.left_context()
                      + nnet.right_context(), 5).astype(np.float32)
    widen_nnet(nnet, 12)
    a1 = nnet.components[1]
    assert np.asarray(a1.fields["LinearParams"]).shape[0] == 12
    y = forward_store(nnet, x)[-1]
    assert y.shape[-1] == 4 and np.all(np.isfinite(y))
    np.testing.assert_allclose(y.sum(-1), 1.0, atol=1e-5)


def test_mixup_grows_softmax():
    from kaldi_tpu.nnet2.surgery import mixup_nnet
    nnet = _toy_net(dout=4)
    # give the softmax occupancy stats so mixup can split by counts
    soft = nnet.components[-1]
    soft.fields["ValueSum"] = np.array([40.0, 30.0, 20.0, 10.0])
    soft.fields["Count"] = 100.0
    x = _rng(2).randn(2, 4 + nnet.left_context()
                      + nnet.right_context(), 5).astype(np.float32)
    y0 = forward_store(nnet, x)[-1]
    mixup_nnet(nnet, 8, min_count=1.0, perturb_stddev=0.01)
    y1 = forward_store(nnet, x)[-1]
    assert y1.shape[-1] == 4                 # SumGroup restores dim
    assert type(nnet.components[-1]).__name__ == "SumGroupComponent"
    # the softmax layer itself grew to 8 mixture rows
    assert int(nnet.components[-2].fields["Dim"]) == 8
    np.testing.assert_allclose(y1.sum(-1), 1.0, atol=1e-5)
    # mixing up with tiny perturbations approximates the original
    np.testing.assert_allclose(y1, y0, atol=0.05)


def test_normalize_stddev():
    from kaldi_tpu.nnet2.model import (NormalizeComponent,
                                       PnormComponent)
    from kaldi_tpu.nnet2.surgery import normalize_stddev
    rng = _rng(9)
    W = (rng.randn(10, 5) * 13.0).astype(np.float32)
    nnet = Nnet2([
        AffineComponent(LearningRate=0.01, LinearParams=W,
                        BiasParams=np.zeros(10, np.float32),
                        IsGradient=False),
        PnormComponent(InputDim=10, OutputDim=5, P=2.0),
        NormalizeComponent(Dim=5),
    ])
    normalize_stddev(nnet, stddev=1.0)
    W2 = np.asarray(nnet.components[0].fields["LinearParams"],
                    np.float64)
    b2 = np.asarray(nnet.components[0].fields["BiasParams"],
                    np.float64)
    vec = np.concatenate([W2.ravel(), b2])
    assert float(np.sqrt((vec * vec).mean())) == pytest.approx(
        1.0, rel=1e-4)


def test_fix_nnet_rescales_dead_units():
    from kaldi_tpu.nnet2.surgery import fix_nnet
    nnet = _toy_net(dh=8)
    tanh = nnet.components[2]
    # unit 0 saturated (deriv ~ 0), others healthy
    ds = np.full(8, 0.4 * 100.0)
    ds[0] = 0.001 * 100.0
    tanh.fields["DerivSum"] = ds
    tanh.fields["ValueSum"] = np.zeros(8)
    tanh.fields["Count"] = 100.0
    W_before = np.asarray(
        nnet.components[1].fields["LinearParams"]).copy()
    fix_nnet(nnet)
    W_after = np.asarray(nnet.components[1].fields["LinearParams"])
    # row feeding the saturated unit was shrunk; healthy rows intact
    assert np.linalg.norm(W_after[0]) < np.linalg.norm(W_before[0])
    np.testing.assert_allclose(W_after[1:], W_before[1:])


def test_modify_learning_rates_geometric_mean():
    from kaldi_tpu.nnet2.surgery import modify_learning_rates
    prev = _toy_net(seed=3)
    cur = _toy_net(seed=3)
    st = TrainStats()
    from kaldi_tpu.nnet2.train import train_one_minibatch
    train_one_minibatch(cur, _toy_egs(cur, n=20, seed=5), st)
    lrs0 = [c.fields["LearningRate"] for c in cur.components
            if "LearningRate" in c.fields]
    modify_learning_rates(prev, cur)
    lrs1 = [float(c.fields["LearningRate"]) for c in cur.components
            if "LearningRate" in c.fields]
    gm0 = np.exp(np.mean(np.log(lrs0)))
    gm1 = np.exp(np.mean(np.log(lrs1)))
    assert gm1 == pytest.approx(gm0, rel=1e-3)


def test_average_nnets():
    from kaldi_tpu.nnet2.surgery import average_nnets
    a, b = _toy_net(seed=1), _toy_net(seed=2)
    avg = average_nnets([a, b])
    i = updatable_indices(avg)[0]
    np.testing.assert_allclose(
        get_params(avg, i),
        0.5 * (get_params(a, i) + get_params(b, i)), atol=1e-6)
    s = average_nnets([a, b], sum_mode=True)
    np.testing.assert_allclose(
        get_params(s, i), get_params(a, i) + get_params(b, i),
        atol=1e-6)
    k = average_nnets([a, b], skip_last_layer=True)
    last = updatable_indices(avg)[-1]
    np.testing.assert_allclose(get_params(k, last),
                               get_params(a, last), atol=1e-6)


# ---------------------------------------------------------------------------
# CLI workflow end-to-end (yes/no corpus: GMM bootstrap -> egs ->
# nnet2 CE training -> transitions/priors -> latgen decode -> MMI)


def run(tool, *args):
    rc = get_tool(tool)([tool] + [str(a) for a in args])
    assert rc == 0, f"{tool} failed with {rc}"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from kaldi_tpu.decoder.graph import Lang, make_lexicon_fst
    from kaldi_tpu.feat.wave import WaveData
    from kaldi_tpu.util import kaldi_io
    from kaldi_tpu.util.table import TableWriter
    from test_mono_e2e import FS, make_corpus, unigram_g

    d = tmp_path_factory.mktemp("nnet2_cli")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=12, num_test=4)
    for name, wavs in (("train", train_wav), ("test", test_wav)):
        scp = []
        for utt, wav in wavs.items():
            p = d / f"{utt}.wav"
            with open(p, "wb") as f:
                WaveData(FS, wav[None, :]).write(f)
            scp.append(f"{utt} {p}")
        (d / f"wav_{name}.scp").write_text("\n".join(scp) + "\n")
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    topo = lang.make_topology()
    kaldi_io.write_kaldi_object(topo.write, str(d / "topo"),
                                binary=False)
    L = make_lexicon_fst(lang, with_disambig=True)
    kaldi_io.write_kaldi_object(L.write, str(d / "L.fst"))
    with TableWriter("int-vector", f"ark:{d}/train_text.int") as w:
        for utt, words in train_txt.items():
            w.write(utt, lang.word_ids(words))
    g = unigram_g(lang)
    kaldi_io.write_kaldi_object(g.write, str(d / "G.fst"))

    # features + GMM bootstrap (mono) for alignments
    run("compute-mfcc-feats", f"--sample-frequency={FS}", "--dither=0",
        f"scp:{d}/wav_train.scp", f"ark:{d}/train.ark")
    run("compute-mfcc-feats", f"--sample-frequency={FS}", "--dither=0",
        f"scp:{d}/wav_test.scp", f"ark:{d}/test.ark")
    run("gmm-init-mono", f"--train-feats=ark:{d}/train.ark",
        f"{d}/topo", 13, f"{d}/0.mdl", f"{d}/tree")
    run("compile-train-graphs", "--self-loop-scale=0.1", f"{d}/tree",
        f"{d}/0.mdl", f"{d}/L.fst", f"ark:{d}/train_text.int",
        f"ark:{d}/graphs.ark")
    run("align-equal-compiled", f"ark:{d}/graphs.ark",
        f"ark:{d}/train.ark", f"ark:{d}/ali.ark")
    mdl = "0.mdl"
    for it in range(3):
        run("gmm-acc-stats-ali", f"{d}/{mdl}", f"ark:{d}/train.ark",
            f"ark:{d}/ali.ark", f"{d}/acc")
        run("gmm-est", "--min-gaussian-occupancy=3", f"{d}/{mdl}",
            f"{d}/acc", f"{d}/{it + 1}.mdl")
        mdl = f"{it + 1}.mdl"
        run("gmm-align-compiled", "--beam=10", "--acoustic-scale=0.1",
            f"{d}/{mdl}", f"ark:{d}/graphs.ark", f"ark:{d}/train.ark",
            f"ark:{d}/ali.ark")
    run("ali-to-pdf", f"{d}/{mdl}", f"ark:{d}/ali.ark",
        f"ark:{d}/pdf_ali.ark")
    run("ali-to-post", f"ark:{d}/pdf_ali.ark", f"ark:{d}/post.ark")

    # decode graph for nnet2 latgen
    from kaldi_tpu.decoder.graph import make_decoding_graph
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.tree.context_dep import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      str(d / "tree"))
    tm = kaldi_io.read_kaldi_object(TransitionModel.read,
                                    str(d / mdl))
    hclg = make_decoding_graph(lang, g, tree, tm)
    kaldi_io.write_kaldi_object(hclg.write, str(d / "HCLG.fst"))
    return d, mdl, lang, test_txt


def test_cli_nnet2_training_workflow(workdir, capsys):
    d, gmm_mdl, lang, test_txt = workdir
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.util import kaldi_io
    tm = kaldi_io.read_kaldi_object(TransitionModel.read,
                                    str(d / gmm_mdl))
    num_pdfs = tm.num_pdfs
    # init raw net + am
    cfg = (f"SpliceComponent input-dim=13 left-context=1 "
           f"right-context=1\n"
           f"AffineComponentPreconditioned input-dim=39 output-dim=32 "
           f"learning-rate=0.02 alpha=4.0\n"
           f"TanhComponent dim=32\n"
           f"AffineComponentPreconditioned input-dim=32 "
           f"output-dim={num_pdfs} learning-rate=0.02 alpha=4.0\n"
           f"SoftmaxComponent dim={num_pdfs}\n")
    (d / "nnet.config").write_text(cfg)
    run("nnet-init", f"{d}/nnet.config", f"{d}/raw0")
    run("nnet-am-init", f"{d}/tree", f"{d}/topo", f"{d}/raw0",
        f"{d}/nn0.mdl")
    # egs
    run("nnet-get-egs", "--left-context=1", "--right-context=1",
        f"ark:{d}/train.ark", f"ark:{d}/post.ark", f"ark:{d}/egs.ark")
    run("nnet-shuffle-egs", "--srand=0", f"ark:{d}/egs.ark",
        f"ark:{d}/egs_shuf.ark")
    run("nnet-subset-egs", "--n=200", f"ark:{d}/egs_shuf.ark",
        f"ark:{d}/egs_sub.ark")
    # CE training: multi-pass SGD with a geometrically decayed
    # learning rate (train_pnorm_simple.sh initial/final-learning-rate
    # schedule; a fixed hot LR oscillates on this tiny net), then
    # combine the last two models (combine-nnet.cc)
    n_iters, lr0, lr1 = 6, 0.02, 0.004
    prev = "nn0.mdl"
    for it in range(n_iters):
        lr = lr0 * (lr1 / lr0) ** (it / (n_iters - 1))
        run("nnet-am-copy", f"--learning-rate={lr}", f"{d}/{prev}",
            f"{d}/lr{it}.mdl")
        tool, extra = "nnet-train-simple", []
        if it % 2:
            tool, extra = "nnet-train-parallel", ["--num-threads=2"]
        run(tool, "--minibatch-size=64", *extra, f"{d}/lr{it}.mdl",
            f"ark:{d}/egs_shuf.ark", f"{d}/nn{it + 1}.mdl")
        prev = f"nn{it + 1}.mdl"
    run("nnet-combine", f"{d}/nn{n_iters - 1}.mdl", f"{d}/{prev}",
        f"ark:{d}/egs_sub.ark", f"{d}/nn_comb.mdl")
    run("nnet-show-progress", f"{d}/nn{n_iters - 1}.mdl", f"{d}/{prev}",
        f"ark:{d}/egs_sub.ark")
    capsys.readouterr()
    # objf must improve over training
    from kaldi_tpu.nnet2 import read_nnet2_am
    from kaldi_tpu.nnet2.egs import NnetExample
    from kaldi_tpu.nnet2.train import compute_prob
    from kaldi_tpu.util.table import SequentialTableReader
    egs = [eg for _, eg in SequentialTableReader(
        NnetExample, f"ark:{d}/egs.ark")]
    _, am0 = read_nnet2_am(f"{d}/nn0.mdl")
    _, amc = read_nnet2_am(f"{d}/nn_comb.mdl")
    t0, w0 = compute_prob(am0.nnet, egs)
    tc, wc = compute_prob(amc.nnet, egs)
    assert tc / wc > t0 / w0 + 0.1
    # transitions + priors (prior-floor raised: with 12 utterances two
    # pdfs get zero alignment occupancy, and the default 5e-6 floor
    # would hand them a spurious +12 nat pseudo-loglike boost)
    run("nnet-train-transitions", "--prior-floor=0.01",
        f"{d}/nn_comb.mdl", f"ark:{d}/ali.ark", f"{d}/nn_final.mdl")
    _, amf = read_nnet2_am(f"{d}/nn_final.mdl")
    assert np.asarray(amf.priors).sum() == pytest.approx(1.0, abs=1e-4)
    # decode the test set (acoustic scale 1.0: the tiny softmax net's
    # pseudo-loglikes have ~5 nat dynamic range, so kaldi's usual 0.1
    # would let the graph scores drown the acoustics)
    run("nnet-latgen-faster", "--beam=12", "--acoustic-scale=1.0",
        f"{d}/nn_final.mdl", f"{d}/HCLG.fst", f"ark:{d}/test.ark",
        f"ark:{d}/lat.ark", f"ark:{d}/words.ark")
    from kaldi_tpu.util.table import SequentialTableReader as STR
    hyps = {k: [lang.word_names[i] for i in v] for k, v in
            STR("int-vector", f"ark:{d}/words.ark")}
    assert len(hyps) == len(test_txt)
    correct = sum(list(hyps[u]) == list(test_txt[u]) for u in hyps)
    assert correct >= len(test_txt) - 1      # trained net decodes
    # align with the nnet2 model
    run("nnet-align-compiled", "--beam=12", f"{d}/nn_final.mdl",
        f"ark:{d}/graphs.ark", f"ark:{d}/train.ark",
        f"ark:{d}/ali_nnet.ark")


def test_cli_nnet2_discriminative_workflow(workdir):
    d, gmm_mdl, lang, _ = workdir
    if not os.path.exists(f"{d}/nn_final.mdl"):
        pytest.skip("CE workflow test must run first")
    # denominator lattices on TRAIN data with the trained net
    run("nnet-latgen-faster", "--beam=12", "--lattice-beam=6",
        "--acoustic-scale=1.0", f"{d}/nn_final.mdl", f"{d}/HCLG.fst",
        f"ark:{d}/train.ark", f"ark:{d}/den_lat.ark")
    run("nnet-get-egs-discriminative", f"{d}/nn_final.mdl",
        f"ark:{d}/train.ark", f"ark:{d}/ali_nnet.ark",
        f"ark:{d}/den_lat.ark", f"ark:{d}/degs.ark")
    run("nnet-shuffle-egs-discriminative", "--srand=1",
        f"ark:{d}/degs.ark", f"ark:{d}/degs_shuf.ark")
    run("nnet-copy-egs-discriminative", f"ark:{d}/degs_shuf.ark",
        f"ark:{d}/degs2.ark")
    # hashes must match across a copy
    assert get_tool("nnet-compare-hash-discriminative")([
        "nnet-compare-hash-discriminative", f"{d}/nn_final.mdl",
        f"ark:{d}/degs_shuf.ark", f"ark:{d}/degs2.ark"]) == 0
    for crit in ("mmi", "smbr"):
        run("nnet-train-discriminative-simple", f"--criterion={crit}",
            "--acoustic-scale=0.1", f"{d}/nn_final.mdl",
            f"ark:{d}/degs.ark", f"{d}/nn_{crit}.mdl")
        assert os.path.exists(f"{d}/nn_{crit}.mdl")


def test_cli_surgery_tools(workdir, capsys):
    d, _, _, _ = workdir
    if not os.path.exists(f"{d}/nn_final.mdl"):
        pytest.skip("CE workflow test must run first")
    run("nnet-am-widen", "--hidden-layer-dim=48", f"{d}/nn_final.mdl",
        f"{d}/wide.mdl")
    run("nnet-am-mixup", "--num-mixtures=40", "--min-count=10",
        f"{d}/wide.mdl", f"{d}/mix.mdl")
    run("nnet-am-fix", f"{d}/mix.mdl", f"{d}/fixed.mdl")
    run("nnet-normalize-stddev", f"{d}/fixed.mdl", f"{d}/norm.mdl")
    run("nnet-am-switch-preconditioning", f"{d}/norm.mdl",
        f"{d}/online.mdl")
    run("nnet-am-info", f"{d}/online.mdl")
    out = capsys.readouterr().out
    assert "AffineComponentPreconditionedOnline" in out
    # feature transform estimation from LDA accumulators
    run("acc-lda", f"{d}/3.mdl", f"ark:{d}/train.ark",
        f"ark:{d}/ali.ark", f"{d}/lda.acc")
    run("nnet-get-feature-transform", "--dim=13",
        f"{d}/feat_trans.mat", f"{d}/lda.acc")
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.util import kaldi_io
    with kaldi_io.input_stream(f"{d}/feat_trans.mat") as f:
        b = iof.init_input_stream(f)
        mat = iof.read_matrix(f, b)
    assert np.asarray(mat).shape[0] == 13
