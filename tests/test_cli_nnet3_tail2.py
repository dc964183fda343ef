"""nnet3 training/egs tail: nnet3-train (frame CE), combine,
am-train-transitions, LDA stats from egs (plain + chain FB),
dense/simple egs, discriminative egs ops, chain add-post,
chain-make-num-fst-e2e, rnnlm-get-egs."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def _toy_feats_and_posts(tmp_path, T=60, D=8, K=4, n_utt=3, seed=0):
    """Features whose class is linearly separable + matching
    pdf-posterior targets."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=3.0, size=(K, D))
    feats, posts = {}, {}
    for i in range(n_utt):
        labels = rng.integers(0, K, size=T)
        x = centers[labels] + rng.normal(scale=0.5, size=(T, D))
        feats[f"u{i}"] = x.astype(np.float32)
        posts[f"u{i}"] = [[(int(l), 1.0)] for l in labels]
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        for u in sorted(feats):
            w.write(u, feats[u])
    from kaldi_tpu.hmm.posterior import PosteriorHolder
    with TableWriter(PosteriorHolder(), f"ark:{tmp_path}/post.ark") as w:
        for u in sorted(posts):
            w.write(u, posts[u])
    return feats, posts


def test_nnet3_train_and_combine(tmp_path):
    _toy_feats_and_posts(tmp_path)
    assert get_tool("nnet3-get-egs")([
        "nnet3-get-egs", "--num-frames=12", f"ark:{tmp_path}/feats.ark",
        f"ark:{tmp_path}/post.ark", f"ark:{tmp_path}/egs.ark"]) == 0
    assert get_tool("nnet3-train")([
        "nnet3-train", "--num-epochs=30", "--minibatch-size=8",
        "--hidden-dim=32", "--bottleneck-dim=16", "--num-layers=2",
        f"ark:{tmp_path}/egs.ark", f"{tmp_path}/final.raw"]) == 0
    from kaldi_tpu.nnet3.mdl_io import read_raw_nnet3
    graph = read_raw_nnet3(f"{tmp_path}/final.raw")
    # the trained model classifies the training frames well
    from kaldi_tpu.nnet3.egs import ExampleHolder
    egs = [eg for _k, eg in SequentialTableReader(
        ExampleHolder(), f"ark:{tmp_path}/egs.ark")]
    correct = total = 0
    for eg in egs[:4]:
        out = graph.forward(eg.feats)
        lc = eg.left_context
        for t, frame in enumerate(eg.targets):
            pred = int(np.argmax(out[lc + t]))
            correct += int(pred == frame[0][0])
            total += 1
    assert correct / total > 0.8, (correct, total)
    # combine: averaging the model with itself must be a no-op
    assert get_tool("nnet3-combine")([
        "nnet3-combine", f"{tmp_path}/final.raw",
        f"{tmp_path}/final.raw", f"{tmp_path}/avg.raw"]) == 0
    g2 = read_raw_nnet3(f"{tmp_path}/avg.raw")
    for name, comp in graph.components.items():
        for key, val in comp.fields.items():
            arr = np.asarray(val)
            if arr.dtype.kind == "f" and arr.ndim >= 1:
                np.testing.assert_allclose(
                    np.asarray(g2.components[name].fields[key]), arr,
                    atol=1e-6)


def test_acc_lda_stats(tmp_path):
    _toy_feats_and_posts(tmp_path)
    assert get_tool("nnet3-get-egs")([
        "nnet3-get-egs", "--num-frames=12",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/post.ark",
        f"ark:{tmp_path}/egs.ark"]) == 0
    assert get_tool("nnet3-acc-lda-stats")([
        "nnet3-acc-lda-stats", f"ark:{tmp_path}/egs.ark",
        f"{tmp_path}/lda.acc"]) == 0
    from kaldi_tpu.transform.lda import LdaEstimate, LdaOptions
    est = kaldi_io.read_kaldi_object(LdaEstimate.read,
                                     f"{tmp_path}/lda.acc")
    assert est.zero_acc.sum() == pytest.approx(180.0)  # 3 utts x 60
    mat, full = est.estimate(LdaOptions(dim=4))
    assert mat.shape[0] == 4 and np.isfinite(mat).all()


def test_am_train_transitions(tmp_path):
    from test_hmm_gmm import mono_system
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_am
    topo, tree, tm = mono_system()
    # build a tiny .mdl via nnet3-init + nnet3-am-init surface
    kaldi_io.write_kaldi_object(tm.write, f"{tmp_path}/trans.mdl")
    cfg = (f"input-node name=input dim=4\n"
           f"component-node name=aff component=aff input=input\n"
           f"output-node name=output input=aff objective=linear\n")
    open(f"{tmp_path}/cfg", "w").write(cfg + f"""
<NumComponents> 1
<ComponentName> aff <AffineComponent> <LearningRate> 0.01 <LinearParams>  [
""" + "\n".join("  " + " ".join("0.1" if j == i % 4 else "0"
                                for j in range(4))
                for i in range(tm.num_pdfs)) + """ ]
<BiasParams>  [ """ + " ".join(["0"] * tm.num_pdfs) + """ ]
</AffineComponent>
""")
    # write raw via importer round-trip
    raw = (f"<Nnet3>\n{cfg}\n<NumComponents> 1\n"
           "<ComponentName> aff <AffineComponent> "
           "<LearningRate> 0.01 <LinearParams>  [\n"
           + "\n".join("  " + " ".join("0.1" if j == i % 4 else "0"
                                       for j in range(4))
                       for i in range(tm.num_pdfs))
           + " ]\n<BiasParams>  [ "
           + " ".join(["0"] * tm.num_pdfs)
           + " ]\n</AffineComponent>\n</Nnet3>\n")
    open(f"{tmp_path}/a.raw", "w").write(raw)
    assert get_tool("nnet3-am-init")([
        "nnet3-am-init", f"{tmp_path}/trans.mdl", f"{tmp_path}/a.raw",
        f"{tmp_path}/0.mdl"]) == 0
    # alignments biased to pdf of tid 1
    rng = np.random.default_rng(0)
    with TableWriter("int-vector", f"ark:{tmp_path}/ali.ark") as w:
        for i in range(4):
            w.write(f"u{i}", rng.integers(
                1, tm.num_transition_ids + 1, size=50).astype(np.int32))
    assert get_tool("nnet3-am-train-transitions")([
        "nnet3-am-train-transitions", f"{tmp_path}/0.mdl",
        f"ark:{tmp_path}/ali.ark", f"{tmp_path}/1.mdl"]) == 0
    tm2, _g, info = read_nnet3_am(f"{tmp_path}/1.mdl")
    priors = np.asarray(info["priors"])
    assert priors.shape[0] == tm.num_pdfs
    assert priors.sum() == pytest.approx(1.0, abs=1e-3)


def test_chain_acc_lda_and_add_post(tmp_path):
    from test_hmm_gmm import mono_system
    topo, tree, tm = mono_system()
    rng = np.random.default_rng(1)
    kaldi_io.write_kaldi_object(tm.write, f"{tmp_path}/trans.mdl")
    feats, ali = {}, {}
    for i in range(2):
        T = 90
        feats[f"u{i}"] = rng.normal(size=(T, 6)).astype(np.float32)
        ali[f"u{i}"] = rng.integers(1, tm.num_transition_ids + 1,
                                    size=T).astype(np.int32)
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        for u in sorted(feats):
            w.write(u, feats[u])
    with TableWriter("int-vector", f"ark:{tmp_path}/ali.ark") as w:
        for u in sorted(ali):
            w.write(u, ali[u])
    assert get_tool("nnet3-chain-get-egs")([
        "nnet3-chain-get-egs", "--chunk-width=30",
        "--frame-subsampling-factor=3", f"{tmp_path}/trans.mdl",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/ali.ark",
        f"ark:{tmp_path}/egs.ark"]) == 0
    assert get_tool("nnet3-chain-acc-lda-stats")([
        "nnet3-chain-acc-lda-stats", "--frame-subsampling-factor=3",
        f"ark:{tmp_path}/egs.ark", f"{tmp_path}/lda.acc"]) == 0
    from kaldi_tpu.transform.lda import LdaEstimate
    est = kaldi_io.read_kaldi_object(LdaEstimate.read,
                                     f"{tmp_path}/lda.acc")
    # every output frame contributes weight 1 total
    assert est.zero_acc.sum() == pytest.approx(2 * 30 / 3 * 3,
                                               rel=1e-3)
    # add-post: posterior mass on one pdf shifts arc log-probs
    from kaldi_tpu.hmm.posterior import PosteriorHolder
    pdf0 = tm.transition_id_to_pdf(1)
    with TableWriter(PosteriorHolder(), f"ark:{tmp_path}/post.ark") as w:
        for u in sorted(feats):
            w.write(u, [[(pdf0, 1.0)]] * 30)
    assert get_tool("nnet3-chain-add-post-to-egs")([
        "nnet3-chain-add-post-to-egs", f"ark:{tmp_path}/egs.ark",
        f"ark:{tmp_path}/post.ark", f"ark:{tmp_path}/egs2.ark"]) == 0
    from kaldi_tpu.nnet3.egs import ChainExampleHolder
    old = dict(SequentialTableReader(ChainExampleHolder(),
                                     f"ark:{tmp_path}/egs.ark"))
    new = dict(SequentialTableReader(ChainExampleHolder(),
                                     f"ark:{tmp_path}/egs2.ark"))
    assert set(old) == set(new)
    for k in old:
        g0, g1 = old[k].num_graph, new[k].num_graph
        assert not np.allclose(g0.log_prob, g1.log_prob)


def test_degs_ops_and_dense_simple_egs(tmp_path):
    rng = np.random.default_rng(2)
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    from kaldi_tpu.nnet3.egs import (DiscriminativeExampleHolder,
                                     NnetDiscriminativeExample)
    lat = VectorFst(LatticeWeight)
    s0, s1 = lat.add_state(), lat.add_state()
    lat.set_start(s0)
    lat.add_arc(s0, Arc(1, 1, (0.1, 0.2), s1))
    lat.set_final(s1, (0.0, 0.0))
    with TableWriter(DiscriminativeExampleHolder(),
                     f"ark:{tmp_path}/degs.ark") as w:
        for i in range(6):
            eg = NnetDiscriminativeExample(
                feats=rng.normal(size=(10, 4)).astype(np.float32),
                num_ali=[1] * 10, den_lat=lat)
            w.write(f"eg{i}", eg)
    assert get_tool("nnet3-discriminative-shuffle-egs")([
        "nnet3-discriminative-shuffle-egs", "--srand=3",
        f"ark:{tmp_path}/degs.ark", f"ark:{tmp_path}/shuf.ark"]) == 0
    keys = [k for k, _ in SequentialTableReader(
        DiscriminativeExampleHolder(), f"ark:{tmp_path}/shuf.ark")]
    assert sorted(keys) == [f"eg{i}" for i in range(6)]
    assert keys != [f"eg{i}" for i in range(6)]
    assert get_tool("nnet3-discriminative-subset-egs")([
        "nnet3-discriminative-subset-egs", "--n=2",
        f"ark:{tmp_path}/degs.ark", f"ark:{tmp_path}/sub.ark"]) == 0
    assert len(list(SequentialTableReader(
        DiscriminativeExampleHolder(), f"ark:{tmp_path}/sub.ark"))) == 2
    assert get_tool("nnet3-discriminative-merge-egs")([
        "nnet3-discriminative-merge-egs", f"ark:{tmp_path}/degs.ark",
        f"ark:{tmp_path}/merged.ark"]) == 0
    # dense targets
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u0", rng.normal(size=(20, 4)).astype(np.float32))
    with TableWriter("matrix", f"ark:{tmp_path}/t.ark") as w:
        w.write("u0", rng.uniform(size=(20, 3)).astype(np.float32))
    assert get_tool("nnet3-get-egs-dense-targets")([
        "nnet3-get-egs-dense-targets", "--num-frames=10",
        f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/t.ark",
        f"ark:{tmp_path}/degs2.ark"]) == 0
    from kaldi_tpu.nnet3.egs import ExampleHolder
    egs = list(SequentialTableReader(ExampleHolder(),
                                     f"ark:{tmp_path}/degs2.ark"))
    assert len(egs) == 2 and len(egs[0][1].targets[0]) == 3
    # simple egs from posterior targets
    from kaldi_tpu.hmm.posterior import PosteriorHolder
    with TableWriter(PosteriorHolder(), f"ark:{tmp_path}/p.ark") as w:
        w.write("u0", [[(1, 1.0)]] * 20)
    assert get_tool("nnet3-get-egs-simple")([
        "nnet3-get-egs-simple", f"input=ark:{tmp_path}/f.ark",
        f"output=ark:{tmp_path}/p.ark",
        f"ark:{tmp_path}/segs.ark"]) == 0
    segs = list(SequentialTableReader(ExampleHolder(),
                                      f"ark:{tmp_path}/segs.ark"))
    assert len(segs) == 1 and segs[0][1].feats.shape == (20, 4)


def test_chain_make_num_fst_e2e(tmp_path):
    from test_hmm_gmm import mono_system
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import write_fst
    topo, tree, tm = mono_system()
    kaldi_io.write_kaldi_object(tm.write, f"{tmp_path}/trans.mdl")
    # linear tid FST
    fst = VectorFst(TropicalWeight)
    states = [fst.add_state() for _ in range(4)]
    fst.set_start(states[0])
    for i, tid in enumerate([1, 2, 3]):
        fst.add_arc(states[i], Arc(tid, tid, 0.0, states[i + 1]))
    fst.set_final(states[3], 0.0)
    with TableWriter("fst", f"ark:{tmp_path}/tid.fsts") as w:
        w.write("u0", fst)
    # normalization FST: accepts anything over pdf+1 symbols
    norm = VectorFst(TropicalWeight)
    s = norm.add_state()
    norm.set_start(s)
    norm.set_final(s, 0.0)
    for pdf1 in range(1, tm.num_pdfs + 1):
        norm.add_arc(s, Arc(pdf1, pdf1, 0.0, s))
    with open(f"{tmp_path}/norm.fst", "wb") as f:
        write_fst(f, norm)
    assert get_tool("chain-make-num-fst-e2e")([
        "chain-make-num-fst-e2e", f"{tmp_path}/trans.mdl",
        f"{tmp_path}/norm.fst", f"ark:{tmp_path}/tid.fsts",
        f"ark:{tmp_path}/pdf.fsts"]) == 0
    out = dict(SequentialTableReader("fst",
                                     f"ark:{tmp_path}/pdf.fsts"))["u0"]
    labels = [a.ilabel for s_ in range(out.num_states)
              for a in out.arcs[s_]]
    want = [tm.transition_id_to_pdf(t) + 1 for t in (1, 2, 3)]
    assert sorted(labels) == sorted(want)


def test_rnnlm_get_egs(tmp_path):
    open(f"{tmp_path}/sents.txt", "w").write(
        "1.0 5 6 7 8\n0.5 9 10\n")
    assert get_tool("rnnlm-get-egs")([
        "rnnlm-get-egs", "--chunk-length=3", f"{tmp_path}/sents.txt",
        f"ark:{tmp_path}/egs.ark"]) == 0
    egs = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/egs.ark"))
    # sentence 0: seq = [1,5,6,7,8,2]; chunks [1,5,6]->[5,6,7],
    # [7,8]->[8,2]
    e0 = egs["line0-0"]
    np.testing.assert_array_equal(e0[0], [1, 5, 6])
    np.testing.assert_array_equal(e0[1], [5, 6, 7])
    e1 = egs["line0-1"]
    np.testing.assert_array_equal(e1[0], [7, 8])
    np.testing.assert_array_equal(e1[1], [8, 2])
    assert egs["line1-0"][2][0] == pytest.approx(0.5)
