"""Pruned lattice x LM composition (lat/compose-lattice-pruned.h
parity): equivalence with full composition at a wide beam, actual
pruning at a narrow beam, ConstArpaLm interchangeability with the
dict-based DeterministicLm, and the lattice-lmrescore-pruned flow
(subtract old G, add new LM)."""

import io

import numpy as np
import pytest

from kaldi_tpu.lat.compose_pruned import compose_lattice_pruned
from kaldi_tpu.lat.functions import lattice_best_path
from kaldi_tpu.lm.arpa import parse_arpa
from kaldi_tpu.lm.const_arpa import ConstArpaLm
from kaldi_tpu.lm.rescore import DeterministicLm, lattice_lmrescore
from tests.test_const_arpa import random_arpa
from tests.test_lattice_properties import random_lattice


def _lm_pair(rng, vocab=8, order=3):
    """(DeterministicLm over 'w{i-1}' names, ConstArpaLm) from one
    random ARPA; lattice word id i maps to token w{i-1}."""
    text = random_arpa(rng, vocab=vocab, order=order, n_sent=40)
    ref = parse_arpa(text)
    names = {i: f"w{i - 1}" for i in range(1, vocab + 1)}
    det = DeterministicLm(ref, names)
    carpa = ConstArpaLm.build_from_arpa(io.StringIO(text))
    # remap: lattice word id -> carpa's internal id
    syms = carpa.symbols

    class Remap:
        def start(self):
            return carpa.start()

        def step(self, s, wid):
            return carpa.step(s, syms.get(f"w{wid - 1}", 10 ** 9))

        def final(self, s):
            return carpa.final(s)

    return det, Remap()


@pytest.mark.parametrize("seed", range(6))
def test_wide_beam_matches_full_composition(seed):
    rng = np.random.default_rng(seed)
    lat = random_lattice(rng, T=6, width=3, num_words=8)
    det, carpa = _lm_pair(rng)
    full = lattice_lmrescore(lat, det, lm_scale=1.0)
    pruned = compose_lattice_pruned(lat, carpa, lm_scale=1.0,
                                    beam=1000.0, max_arcs=10 ** 9)
    _, w1, c1 = lattice_best_path(full)
    _, w2, c2 = lattice_best_path(pruned)
    assert w2 == w1
    assert c2 == pytest.approx(c1, abs=1e-3)


@pytest.mark.parametrize("seed", range(4))
def test_narrow_beam_prunes_but_keeps_best(seed):
    rng = np.random.default_rng(seed + 100)
    lat = random_lattice(rng, T=8, width=4, num_words=8)
    det, carpa = _lm_pair(rng)
    full = lattice_lmrescore(lat, det, lm_scale=1.0)
    _, w_full, c_full = lattice_best_path(full)
    pruned = compose_lattice_pruned(lat, carpa, lm_scale=1.0, beam=0.5)
    _, w_p, c_p = lattice_best_path(pruned)
    assert w_p == w_full
    assert c_p == pytest.approx(c_full, abs=1e-3)
    assert pruned.num_states <= full.num_states


def test_narrow_beam_actually_shrinks_deep_lattice():
    rng = np.random.default_rng(42)
    lat = random_lattice(rng, T=12, width=6, num_words=8)
    det, carpa = _lm_pair(rng)
    full = lattice_lmrescore(lat, det, lm_scale=1.0)
    _, w_full, c_full = lattice_best_path(full)
    pruned = compose_lattice_pruned(lat, carpa, lm_scale=1.0, beam=0.3)
    _, w_p, c_p = lattice_best_path(pruned)
    assert w_p == w_full
    assert c_p == pytest.approx(c_full, abs=1e-3)
    assert pruned.num_states < full.num_states


def test_const_arpa_in_full_rescore_matches_dict_lm():
    rng = np.random.default_rng(7)
    lat = random_lattice(rng, T=5, width=3, num_words=8)
    det, carpa = _lm_pair(rng)
    a = lattice_lmrescore(lat, det, lm_scale=1.0)
    b = lattice_lmrescore(lat, carpa, lm_scale=1.0)
    _, wa, ca = lattice_best_path(a)
    _, wb, cb = lattice_best_path(b)
    assert wa == wb
    assert ca == pytest.approx(cb, abs=1e-3)


def test_max_arcs_budget_stops_expansion():
    rng = np.random.default_rng(11)
    lat = random_lattice(rng, T=10, width=5, num_words=8)
    det, carpa = _lm_pair(rng)
    pruned = compose_lattice_pruned(lat, carpa, lm_scale=1.0,
                                    beam=1000.0, max_arcs=30)
    # still yields a usable (possibly truncated) lattice
    assert pruned.num_states <= 40


def test_cli_round_trip(tmp_path):
    """arpa-to-const-arpa + lattice-lmrescore-const-arpa +
    lattice-lmrescore-pruned through the dispatcher."""
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.util.table import SequentialTableReader, TableWriter

    rng = np.random.default_rng(3)
    vocab = 8
    text = random_arpa(rng, vocab=vocab, order=3, n_sent=40)
    arpa_path = tmp_path / "lm.arpa"
    arpa_path.write_text(text)
    words_path = tmp_path / "words.txt"
    words_path.write_text(
        "<eps> 0\n"
        + "".join(f"w{i - 1} {i}\n" for i in range(1, vocab + 1))
        + f"<s> {vocab + 1}\n</s> {vocab + 2}\n")
    carpa_path = tmp_path / "lm.carpa"
    rc = get_tool("arpa-to-const-arpa")(
        ["arpa-to-const-arpa", f"--read-symbol-table={words_path}",
         str(arpa_path), str(carpa_path)])
    assert rc == 0

    lat = random_lattice(rng, T=5, width=3, num_words=vocab)
    w = TableWriter(LatticeHolder(), f"ark:{tmp_path}/in.lats")
    w.write("utt1", lat)
    w.close()
    rc = get_tool("lattice-lmrescore-const-arpa")(
        ["lattice-lmrescore-const-arpa", "--lm-scale=1.0",
         f"ark:{tmp_path}/in.lats", str(carpa_path),
         f"ark:{tmp_path}/out.lats"])
    assert rc == 0
    got = dict(SequentialTableReader(LatticeHolder(),
                                     f"ark:{tmp_path}/out.lats"))
    ref = parse_arpa(text)
    det = DeterministicLm(ref, {i: f"w{i - 1}"
                                for i in range(1, vocab + 1)})
    want = lattice_lmrescore(lat, det, 1.0)
    _, w1, c1 = lattice_best_path(want)
    _, w2, c2 = lattice_best_path(got["utt1"])
    assert w2 == w1 and c2 == pytest.approx(c1, abs=1e-3)

    rc = get_tool("lattice-lmrescore-pruned")(
        ["lattice-lmrescore-pruned", f"ark:{tmp_path}/in.lats",
         str(arpa_path), str(words_path), str(carpa_path),
         f"ark:{tmp_path}/out2.lats"])
    assert rc == 0
    got2 = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{tmp_path}/out2.lats"))
    # subtract-then-add of the SAME LM returns the original best path
    _, w0, c0 = lattice_best_path(lat)
    _, w3, c3 = lattice_best_path(got2["utt1"])
    assert w3 == w0 and c3 == pytest.approx(c0, abs=1e-2)
