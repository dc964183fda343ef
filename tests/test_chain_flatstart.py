"""Flat-start (e2e) LF-MMI: training with NO bootstrap GMM and NO
alignments (parity: chain-supervision.cc
TrainingGraphToSupervisionE2e + egs/wsj local/e2e recipes)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_mono_e2e import FS, make_corpus, unigram_g

from kaldi_tpu.decoder.graph import Lang, make_decoding_graph
from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
from kaldi_tpu.feat.window import FrameExtractionOptions
from kaldi_tpu.nnet3.models import ChainTdnnfConfig
from kaldi_tpu.util.edit_distance import WerStats


def test_e2e_numerator_structure():
    from kaldi_tpu.chain.supervision import transcript_to_e2e_numerator
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.tree import monophone_context_dependency
    phones = [1, 2, 3]
    topo = HmmTopology.chain_topology(phones)
    tree = monophone_context_dependency(phones, {p: 2 for p in phones})
    tm = TransitionModel(topo, tree)
    g = transcript_to_e2e_numerator([2, 3], tm, optional_sil=1)
    # states: start + 2 phones + 3 boundary silences
    assert g.num_states == 3 + 3
    # every phone contributes an entry arc and a self-loop
    assert (np.asarray(g.src) == np.asarray(g.dst)).sum() >= 2 + 3
    # a path of the right length exists: forward scoring over T frames
    # with uniform acoustics must be finite, and T < #phones must not
    # reach a final state
    from kaldi_tpu.chain.graphs import batch_pack
    import jax.numpy as jnp
    from kaldi_tpu.chain.objective import _forward_loglike
    arrs = batch_pack([g])
    S = arrs[4].shape[1]             # padded state count
    out = jnp.zeros((6, tm.num_pdfs))
    ll = _forward_loglike(out, *[jnp.asarray(a[0]) for a in arrs],
                          leaky=0.0, num_states=S)
    assert np.isfinite(float(ll))
    short = jnp.zeros((1, tm.num_pdfs))
    ll2 = _forward_loglike(short, *[jnp.asarray(a[0]) for a in arrs],
                           leaky=0.0, num_states=S)
    assert float(ll2) < -1e9         # transcript cannot fit in 1 frame


def test_flat_start_chain_end_to_end():
    """No GMM, no alignments: train from transcripts alone, decode,
    and demand a usable WER on the synthetic corpus."""
    from kaldi_tpu.recipes.chain import (ChainTrainOptions,
                                         nnet_log_likes,
                                         train_chain_e2e)
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=12, num_test=4)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    cfg = ChainTdnnfConfig(feat_dim=13, num_pdfs=2 * len(lang.phones),
                           hidden_dim=64, bottleneck_dim=16,
                           prefinal_dim=32, num_layers=4,
                           subsample_layer=2,
                           frame_subsampling_factor=3)
    opts = ChainTrainOptions(num_epochs=14, learning_rate=2e-3,
                             minibatch_size=4)
    model, variables, den, chain_tm, chain_tree = train_chain_e2e(
        lang, tf, train_txt, cfg, opts)
    lang.topo = chain_tm.topo
    hclg = make_decoding_graph(lang, unigram_g(lang), chain_tree,
                               chain_tm, transition_scale=1.0,
                               self_loop_scale=1.0)
    scores = nnet_log_likes(model, variables, sf)
    dec = FasterDecoder(hclg, FasterDecoderOptions(beam=24.0))
    best = None
    for ac in (0.5, 1.0):
        for wip in (0.0, 1.0, 2.0):
            stats = WerStats()
            for utt, ref in test_txt.items():
                res = dec.decode(scores[utt], chain_tm.id2pdf_id,
                                 acoustic_scale=ac,
                                 word_ins_penalty=wip)
                hyp = [] if res is None else [lang.word_names[w]
                                              for w in res[1]]
                stats.add(ref, hyp)
            if best is None or stats.wer < best.wer:
                best = stats
    print("chain-e2e flat-start:", best.report())
    # flat start forgoes alignments entirely; the bar is looser than
    # the aligned chain test's 15% but must show real learning
    assert best.wer <= 25.0, best.report()


def test_e2e_egs_cli(tmp_path):
    """nnet3-chain-e2e-get-egs writes whole-utterance examples whose
    numerators round-trip."""
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.nnet3.egs import ChainExampleHolder
    from kaldi_tpu.tree import monophone_context_dependency
    from kaldi_tpu.util import kaldi_io
    from kaldi_tpu.util.table import SequentialTableReader, TableWriter
    phones = [1, 2, 3]
    topo = HmmTopology.chain_topology(phones)
    tree = monophone_context_dependency(phones, {p: 2 for p in phones})
    tm = TransitionModel(topo, tree)
    kaldi_io.write_kaldi_object(tm.write, f"{tmp_path}/chain.tm")
    rng = np.random.default_rng(0)
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        w.write("u1", rng.normal(size=(30, 5)).astype(np.float32))
    with TableWriter("int-vector", f"ark:{tmp_path}/phones.ark") as w:
        w.write("u1", np.asarray([2, 3, 2], np.int32))
    rc = get_tool("nnet3-chain-e2e-get-egs")([
        "nnet3-chain-e2e-get-egs", "--optional-silence-phone=1",
        f"{tmp_path}/chain.tm", f"ark:{tmp_path}/feats.ark",
        f"ark:{tmp_path}/phones.ark", f"ark:{tmp_path}/egs.ark"])
    assert rc == 0
    egs = dict(SequentialTableReader(ChainExampleHolder(),
                                     f"ark:{tmp_path}/egs.ark"))
    eg = egs["u1"]
    assert eg.feats.shape == (30, 5)
    assert eg.num_graph.num_states == 4 + 4   # start+3 phones+4 sils
