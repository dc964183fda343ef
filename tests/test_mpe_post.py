"""MPE/sMBR forward-backward (LatticeForwardBackwardMpeVariants,
reference lat/lattice-functions.cc:798) pinned against brute-force
path enumeration, plus the lattice-to-{mpe,smbr}-post CLIs."""

import math
import random

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
from kaldi_tpu.hmm.topology import HmmTopology
from kaldi_tpu.hmm.transition_model import TransitionModel
from kaldi_tpu.lat.functions import (
    lattice_forward_backward_mpe_variants, lattice_state_times)
from kaldi_tpu.tree import monophone_context_dependency

PHONES = [1, 2, 3]
SIL = [2]


@pytest.fixture(scope="module")
def tm():
    topo = HmmTopology.chain_topology(PHONES)
    tree = monophone_context_dependency(PHONES, {p: 2 for p in PHONES})
    return TransitionModel(topo, tree)


def _rand_lattice(tm, rng, T=4):
    """Acyclic lattice: a chain of frame levels, 2-3 states per level,
    dense-ish tid arcs between them, plus one epsilon arc."""
    ntid = tm.num_transition_ids
    lat = VectorFst(LatticeWeight)
    levels = [[lat.add_state()]]
    for _ in range(T):
        levels.append([lat.add_state()
                       for _ in range(rng.randint(2, 3))])
    lat.set_start(levels[0][0])
    for t in range(T):
        for s in levels[t]:
            for d in levels[t + 1]:
                if rng.random() < 0.8:
                    tid = rng.randint(1, ntid)
                    w = (rng.uniform(0, 2), rng.uniform(0, 2))
                    lat.add_arc(s, Arc(tid, tid, w, d))
        # make sure every state has at least one out-arc
        for s in levels[t]:
            if not lat.arcs[s]:
                tid = rng.randint(1, ntid)
                lat.add_arc(s, Arc(tid, tid, (0.5, 0.5),
                                   levels[t + 1][0]))
    # one epsilon arc inside the first level span
    eps_dst = lat.add_state()
    lat.add_arc(levels[1][0], Arc(0, 0, (0.3, 0.0),
                                  eps_dst))
    tid = rng.randint(1, tm.num_transition_ids)
    lat.add_arc(eps_dst, Arc(tid, tid, (0.2, 0.1),
                             levels[2][0]))
    for s in levels[T]:
        lat.finals[s] = (rng.uniform(0, 1), 0.0)
    return lat


def _frame_acc(tm, tid, ref_tid, criterion, one_sil):
    phone = tm.transition_id_to_phone(tid)
    ref_phone = tm.transition_id_to_phone(ref_tid)
    p_sil, r_sil = phone in SIL, ref_phone in SIL
    if criterion == "mpfe":
        if not one_sil:
            return 1.0 if (phone == ref_phone and not p_sil) else 0.0
        return 1.0 if (phone == ref_phone or (p_sil and r_sil)) else 0.0
    pdf = tm.transition_id_to_pdf(tid)
    ref_pdf = tm.transition_id_to_pdf(ref_tid)
    if not one_sil:
        return 1.0 if (pdf == ref_pdf and not p_sil) else 0.0
    return 1.0 if (pdf == ref_pdf or (p_sil and r_sil)) else 0.0


def _brute_force(tm, lat, num_ali, criterion, one_sil):
    zero = lat.semiring.zero
    paths = []

    def rec(s, ll, t, arcs):
        f = lat.finals[s]
        if f != zero:
            paths.append((ll - (f[0] + f[1]), list(arcs)))
        for a in lat.arcs[s]:
            arcs.append((t, a))
            rec(a.nextstate, ll - (a.weight[0] + a.weight[1]),
                t + (1 if a.ilabel != 0 else 0), arcs)
            arcs.pop()

    rec(lat.start, 0.0, 0, [])
    tot = -math.inf
    for ll, _ in paths:
        tot = max(tot, ll) + math.log1p(math.exp(-abs(tot - ll))) \
            if math.isfinite(tot) else ll
    gammas = [math.exp(ll - tot) for ll, _ in paths]
    accs = []
    for _, arcs in paths:
        accs.append(sum(_frame_acc(tm, a.ilabel, int(num_ali[t]),
                                   criterion, one_sil)
                        for t, a in arcs if a.ilabel != 0))
    objf = sum(g * a for g, a in zip(gammas, accs))
    grad = {}
    for (g, a), (_, arcs) in zip(zip(gammas, accs), paths):
        for t, arc in arcs:
            if arc.ilabel != 0:
                k = (t, arc.ilabel)
                grad[k] = grad.get(k, 0.0) + g * (a - objf)
    return objf, grad


@pytest.mark.parametrize("criterion", ["mpfe", "smbr"])
@pytest.mark.parametrize("one_sil", [True, False])
def test_mpe_variants_vs_brute_force(tm, criterion, one_sil):
    rng = random.Random(7 if criterion == "mpfe" else 8)
    for trial in range(4):
        T = 4
        lat = _rand_lattice(tm, rng, T=T)
        assert max(lattice_state_times(lat)) == T
        num_ali = [rng.randint(1, tm.num_transition_ids)
                   for _ in range(T)]
        objf, post = lattice_forward_backward_mpe_variants(
            tm, SIL, lat, num_ali, criterion=criterion,
            one_silence_class=one_sil)
        ref_objf, ref_grad = _brute_force(tm, lat, num_ali,
                                          criterion, one_sil)
        assert objf == pytest.approx(ref_objf, abs=1e-6)
        got = {(t, tid): w for t, row in enumerate(post)
               for tid, w in row}
        for k in set(got) | set(ref_grad):
            assert got.get(k, 0.0) == pytest.approx(
                ref_grad.get(k, 0.0), abs=1e-6), (k, criterion)
        # per-frame weights must sum to ~0 (sum of gamma*acc_diff)
        for row in post:
            assert sum(w for _, w in row) == pytest.approx(0.0,
                                                           abs=1e-6)


def test_cli_smbr_post(tm, tmp_path):
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.util.kaldi_io import write_kaldi_object
    from kaldi_tpu.util.table import SequentialTableReader, TableWriter
    rng = random.Random(3)
    lat = _rand_lattice(tm, rng, T=3)
    num_ali = [rng.randint(1, tm.num_transition_ids) for _ in range(3)]
    write_kaldi_object(tm.write, str(tmp_path / "trans.mdl"))
    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/lat.ark") as w:
        w.write("u1", lat)
    with TableWriter("int-vector", f"ark:{tmp_path}/ali.ark") as w:
        w.write("u1", num_ali)
    for name in ("lattice-to-smbr-post", "lattice-to-mpe-post"):
        rc = get_tool(name)(
            [name, "--silence-phones=2", "--acoustic-scale=0.5",
             str(tmp_path / "trans.mdl"), f"ark:{tmp_path}/ali.ark",
             f"ark:{tmp_path}/lat.ark", f"ark:{tmp_path}/post.ark"])
        assert rc == 0
        out = dict(SequentialTableReader("posterior",
                                         f"ark:{tmp_path}/post.ark"))
        assert len(out["u1"]) == 3
        for row in out["u1"]:
            assert sum(w for _, w in row) == pytest.approx(0.0,
                                                           abs=1e-5)
