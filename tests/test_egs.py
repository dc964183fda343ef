"""Egs pipeline: generate -> shuffle -> merge round trip, and training
from on-disk archives matches in-memory chunking."""

import numpy as np
import pytest

from kaldi_tpu.nnet3.egs import (ChainExampleHolder, NnetChainExample,
                                 generate_chain_egs, merged_minibatches,
                                 shuffle_egs)
from kaldi_tpu.util.table import SequentialTableReader

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_hmm_gmm import mono_system


@pytest.fixture()
def system_and_data():
    topo, tree, tm = mono_system()
    rng = np.random.default_rng(0)
    feats = {}
    alignments = {}
    for i in range(4):
        T = 120 + 30 * i
        feats[f"u{i}"] = rng.normal(size=(T, 8)).astype(np.float32)
        tids = []
        while len(tids) < T:
            ts = int(rng.integers(1, tm.num_transition_states + 1))
            tids.extend([tm.self_loop_of(ts)] * int(rng.integers(2, 6)))
        alignments[f"u{i}"] = tids[:T]
    return tm, feats, alignments


def test_generate_shuffle_merge(tmp_path, system_and_data):
    tm, feats, alignments = system_and_data
    n = generate_chain_egs(feats, alignments, tm,
                           f"ark:{tmp_path}/egs.ark", chunk_width=60,
                           subsample=3, left_context=5, right_context=5)
    assert n >= 6
    m = shuffle_egs(f"ark:{tmp_path}/egs.ark",
                    f"ark:{tmp_path}/egs_shuf.ark", seed=1)
    assert m == n
    # keys permuted
    keys_a = [k for k, _ in SequentialTableReader(
        ChainExampleHolder(), f"ark:{tmp_path}/egs.ark")]
    keys_b = [k for k, _ in SequentialTableReader(
        ChainExampleHolder(), f"ark:{tmp_path}/egs_shuf.ark")]
    assert sorted(keys_a) == sorted(keys_b)
    assert keys_a != keys_b
    batches = list(merged_minibatches(f"ark:{tmp_path}/egs_shuf.ark", 2))
    assert batches
    b = batches[0]
    assert b["feats"].shape[0] == 2
    assert b["feats"].shape[1] == 60 + 10  # chunk + contexts
    assert len(b["num_graphs"]) == 6


def test_example_roundtrip(tmp_path, system_and_data):
    tm, feats, alignments = system_and_data
    generate_chain_egs(feats, alignments, tm, f"ark:{tmp_path}/e.ark",
                       chunk_width=50, subsample=1)
    for key, eg in SequentialTableReader(ChainExampleHolder(),
                                         f"ark:{tmp_path}/e.ark"):
        assert eg.num_graph.num_arcs == 50  # subsample 1: one arc/frame
        assert np.isfinite(eg.feats).all()
        break
