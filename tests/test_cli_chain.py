"""chainbin CLI surface end-to-end (src/chainbin/*.cc parity):
chain-est-phone-lm -> chain-make-den-fst -> chain-get-supervision /
nnet3-chain-get-egs -> copy/shuffle/subset/merge/normalize ->
nnet3-chain-train -> nnet3-chain-compute-prob -> nnet3-chain-combine,
all driven through the registered tool entry points on a tiny
mono-trained corpus."""

import os
import sys

import numpy as np
import pytest

from kaldi_tpu.cli import get_tool
from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
from kaldi_tpu.feat.window import FrameExtractionOptions
from kaldi_tpu.recipes.chain import make_chain_system
from kaldi_tpu.recipes.mono import TrainMonoOptions, _align_all, train_mono
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter

sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus


def run(tool, *args):
    rc = get_tool(tool)([tool] + [str(a) for a in args])
    assert rc == 0, f"{tool} failed with {rc}"


def _chain_ali_full_rate(mono_ali, mono_tm, chain_tm):
    """convert-ali to the chain topology at the INPUT frame rate:
    each mono phone segment of d frames -> [forward, self*(d-1)]."""
    from kaldi_tpu.chain.supervision import alignment_to_phone_segments
    from kaldi_tpu.recipes.chain import mono_ali_to_chain_ali
    segs = alignment_to_phone_segments(mono_ali, mono_tm)
    out = []
    for phone, s, e in segs:
        # find the chain forward + self-loop tids for this phone
        ts = None
        for cand in range(1, chain_tm.num_transition_states + 1):
            if chain_tm.transition_state_to_phone(cand) == phone:
                ts = cand
                break
        sl = chain_tm.self_loop_of(ts)
        fwd = None
        for idx in range(chain_tm.num_transition_indices(ts)):
            tid = chain_tm.pair_to_transition_id(ts, idx)
            if not chain_tm.is_self_loop(tid):
                fwd = tid
                break
        out.extend([fwd] + [sl] * (e - s - 1))
    return out


@pytest.fixture(scope="module")
def chainsys(tmp_path_factory):
    d = tmp_path_factory.mktemp("chain_cli")
    train_txt, train_wav, _test_txt, _test_wav = make_corpus(
        num_train=8, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    gmm_sys = train_mono(lang, tf, train_txt,
                         TrainMonoOptions(num_iters=4, totgauss=20,
                                          realign_iters=(1, 2, 3)))
    compiler = TrainingGraphCompiler(gmm_sys.tm, gmm_sys.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    alis = _align_all(gmm_sys, graphs, tf, beam=10.0,
                      acoustic_scale=0.1, transition_scale=1.0)
    chain_tm, chain_tree = make_chain_system(lang, gmm_sys.tm)
    kaldi_io.write_kaldi_object(chain_tree.write, str(d / "tree"))
    kaldi_io.write_kaldi_object(chain_tm.write, str(d / "0.trans_mdl"))
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for utt, f in tf.items():
            w.write(utt, f)
    with TableWriter("int-vector", f"ark:{d}/ali.ark") as w, \
            TableWriter("int-vector", f"ark:{d}/phones.ark") as wp:
        from kaldi_tpu.chain.supervision import alignment_to_phone_segments
        for utt, ali in alis.items():
            cali = _chain_ali_full_rate(list(ali), gmm_sys.tm, chain_tm)
            w.write(utt, cali)
            wp.write(utt, [s[0] for s in
                           alignment_to_phone_segments(list(ali),
                                                       gmm_sys.tm)])
    return d, chain_tm, chain_tree, tf


def test_est_phone_lm_and_den_fst(chainsys):
    d, chain_tm, _tree, _tf = chainsys
    run("chain-est-phone-lm", f"ark:{d}/phones.ark", f"{d}/phone_lm.fst")
    run("chain-make-den-fst", f"{d}/tree", f"{d}/0.trans_mdl",
        f"{d}/phone_lm.fst", f"{d}/den.fst", f"{d}/normalization.fst")
    from kaldi_tpu.chain.graphs import den_graph_from_fst_file
    den = den_graph_from_fst_file(f"{d}/den.fst")
    assert den.num_states > 0
    assert int(den.graph.pdf.max()) < chain_tm.num_pdfs
    # stationary initial distribution sums to ~1 in prob space
    init = np.exp(np.asarray(den.graph.initial, np.float64))
    assert abs(init.sum() - 1.0) < 1e-3


def test_get_supervision(chainsys):
    d, _tm, _tree, _tf = chainsys
    run("chain-get-supervision", "--frame-subsampling-factor=3",
        f"{d}/tree", f"{d}/0.trans_mdl", f"ark:{d}/ali.ark",
        f"ark:{d}/sup.ark")
    from kaldi_tpu.nnet3.egs import SupervisionHolder
    n = 0
    for _key, g in SequentialTableReader(SupervisionHolder(),
                                         f"ark:{d}/sup.ark"):
        assert g.num_states > 1 and g.num_arcs >= g.num_states - 1
        n += 1
    assert n == 8


def test_egs_pipeline_and_train(chainsys):
    d, chain_tm, _tree, tf = chainsys
    run("nnet3-chain-get-egs", "--chunk-width=30",
        "--frame-subsampling-factor=3", "--left-context=6",
        "--right-context=6", f"{d}/0.trans_mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/ali.ark", f"ark:{d}/egs.ark")
    from kaldi_tpu.nnet3.egs import ChainExampleHolder

    def count(path):
        return sum(1 for _ in SequentialTableReader(
            ChainExampleHolder(), f"ark:{path}"))

    n0 = count(f"{d}/egs.ark")
    assert n0 >= 8
    run("nnet3-chain-copy-egs", f"ark:{d}/egs.ark",
        f"ark:{d}/egs.1.ark", f"ark:{d}/egs.2.ark")
    assert count(f"{d}/egs.1.ark") + count(f"{d}/egs.2.ark") == n0
    run("nnet3-chain-shuffle-egs", "--srand=1", f"ark:{d}/egs.ark",
        f"ark:{d}/egs_shuf.ark")
    assert count(f"{d}/egs_shuf.ark") == n0
    run("nnet3-chain-subset-egs", "--n=4", f"ark:{d}/egs.ark",
        f"ark:{d}/egs_sub.ark")
    assert count(f"{d}/egs_sub.ark") == 4
    run("nnet3-chain-merge-egs", "--minibatch-size=4",
        f"ark:{d}/egs_shuf.ark", f"ark:{d}/egs_mb.ark")
    assert count(f"{d}/egs_mb.ark") == n0
    run("nnet3-chain-normalize-egs", f"{d}/normalization.fst",
        f"ark:{d}/egs.ark", f"ark:{d}/egs_norm.ark")
    assert count(f"{d}/egs_norm.ark") == n0

    run("nnet3-chain-train", "--num-epochs=2", "--minibatch-size=4",
        "--hidden-dim=32", "--bottleneck-dim=16", "--num-layers=2",
        "--frame-subsampling-factor=3", f"{d}/den.fst",
        f"ark:{d}/egs_shuf.ark", f"{d}/final.raw")
    assert os.path.exists(f"{d}/final.raw")

    run("nnet3-chain-compute-prob", f"{d}/final.raw", f"{d}/den.fst",
        f"ark:{d}/egs_shuf.ark")

    run("nnet3-chain-combine", f"{d}/final.raw", f"{d}/final.raw",
        f"{d}/avg.raw")
    from kaldi_tpu.nnet3.mdl_io import read_raw_nnet3
    a = read_raw_nnet3(f"{d}/final.raw")
    b = read_raw_nnet3(f"{d}/avg.raw")
    for name, comp in a.components.items():
        for key, val in comp.fields.items():
            arr = np.asarray(val)
            if arr.dtype.kind == "f" and arr.ndim >= 1:
                np.testing.assert_allclose(
                    np.asarray(b.components[name].fields[key]), arr,
                    rtol=0, atol=1e-6)
