"""Lattice + KWS CLI tail (parity: latbin lattice-add-trans-probs,
lattice-copy-backoff, lattice-rescore-mapped, nbest-to-lattice,
lattice-minimize; kwsbin lattice-to-kws-index, kws-index-union,
kws-search, compute-atwv)."""

import numpy as np
import pytest

from kaldi_tpu.cli import get_tool
from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
from kaldi_tpu.lat.functions import lattice_best_path, lattice_nbest
from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def linear(words, cost=0.0, tids=None):
    lat = VectorFst(LatticeWeight)
    s = lat.add_state()
    lat.set_start(s)
    for i, wd in enumerate(words):
        ns = lat.add_state()
        tid = tids[i] if tids else i + 1
        lat.add_arc(s, Arc(tid, wd, (cost if i == 0 else 0.0, 0.0), ns))
        s = ns
    lat.set_final(s, (0.0, 0.0))
    return lat


def write_lats(path, items):
    with TableWriter(LatticeHolder(), f"ark:{path}") as w:
        for k, lat in items:
            w.write(k, lat)


def read_lats(path):
    return dict(SequentialTableReader(LatticeHolder(), f"ark:{path}"))


def test_lattice_copy_backoff(tmp_path):
    write_lats(f"{tmp_path}/a.ark", [("u1", linear([5], 1.0))])
    write_lats(f"{tmp_path}/b.ark", [("u1", linear([9], 9.0)),
                                     ("u2", linear([6], 2.0))])
    (tmp_path / "keys").write_text("u1\nu2\nu3\n")
    rc = get_tool("lattice-copy-backoff")([
        "lattice-copy-backoff", f"ark:{tmp_path}/a.ark",
        f"ark:{tmp_path}/b.ark", f"{tmp_path}/keys",
        f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = read_lats(f"{tmp_path}/o.ark")
    assert set(out) == {"u1", "u2"}
    # u1 comes from the FIRST archive
    assert lattice_best_path(out["u1"])[1] == [5]
    assert lattice_best_path(out["u2"])[1] == [6]


def test_nbest_to_lattice(tmp_path):
    write_lats(f"{tmp_path}/nb.ark", [
        ("utt1-1", linear([5, 6], 1.0)),
        ("utt1-2", linear([7], 2.0)),
        ("utt2-1", linear([8], 0.5))])
    rc = get_tool("nbest-to-lattice")([
        "nbest-to-lattice", f"ark:{tmp_path}/nb.ark",
        f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = read_lats(f"{tmp_path}/o.ark")
    assert set(out) == {"utt1", "utt2"}
    words = sorted(tuple(p[1]) for p in lattice_nbest(out["utt1"], 5))
    assert (5, 6) in words and (7,) in words


def test_lattice_minimize(tmp_path):
    # two paths sharing an identical suffix: states must merge
    lat = VectorFst(LatticeWeight)
    s0 = lat.add_state()
    a1, a2, b1, b2 = (lat.add_state() for _ in range(4))
    lat.set_start(s0)
    lat.add_arc(s0, Arc(1, 5, (1.0, 0.0), a1))
    lat.add_arc(s0, Arc(2, 6, (2.0, 0.0), b1))
    # identical suffixes from a1 and b1
    lat.add_arc(a1, Arc(3, 7, (0.5, 0.0), a2))
    lat.add_arc(b1, Arc(3, 7, (0.5, 0.0), b2))
    lat.set_final(a2, (0.0, 0.0))
    lat.set_final(b2, (0.0, 0.0))
    write_lats(f"{tmp_path}/a.ark", [("u1", lat)])
    rc = get_tool("lattice-minimize")([
        "lattice-minimize", f"ark:{tmp_path}/a.ark",
        f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = read_lats(f"{tmp_path}/o.ark")["u1"]
    assert out.num_states < lat.num_states
    paths = sorted((tuple(p[1]), round(p[2], 4))
                   for p in lattice_nbest(out, 5))
    assert paths == [((5, 7), 1.5), ((6, 7), 2.5)]


@pytest.fixture()
def gmm_model(tmp_path):
    """Minimal mono model file for the tm-reading tools."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mono_e2e import FS, make_corpus
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import TrainMonoOptions, train_mono
    train_txt, train_wav, _, _ = make_corpus(num_train=4, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=2, totgauss=12,
                                       realign_iters=(1,)))
    write_am_gmm(f"{tmp_path}/final.mdl", sys_.tm, sys_.am)
    return dict(path=f"{tmp_path}/final.mdl", tm=sys_.tm, am=sys_.am,
                feats=tf)


def test_lattice_add_trans_probs(tmp_path, gmm_model):
    tm = gmm_model["tm"]
    tids = [1, 2]
    lat = linear([5, 6], 1.0, tids=tids)
    write_lats(f"{tmp_path}/a.ark", [("u1", lat)])
    rc = get_tool("lattice-add-trans-probs")([
        "lattice-add-trans-probs", gmm_model["path"],
        f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = read_lats(f"{tmp_path}/o.ark")["u1"]
    exp = 1.0 - float(tm.log_probs[1])
    got = out.arcs[out.start][0].weight[0]
    assert got == pytest.approx(exp, abs=1e-5)


def test_lattice_rescore_mapped(tmp_path, gmm_model):
    tm = gmm_model["tm"]
    lat = linear([5], 1.0, tids=[1])
    write_lats(f"{tmp_path}/a.ark", [("u1", lat)])
    ll = np.zeros((1, tm.num_pdfs), np.float32)
    pdf = tm.transition_id_to_pdf(1)
    ll[0, pdf] = -3.5
    with TableWriter("matrix", f"ark:{tmp_path}/ll.ark") as w:
        w.write("u1", ll)
    rc = get_tool("lattice-rescore-mapped")([
        "lattice-rescore-mapped", gmm_model["path"],
        f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/ll.ark",
        f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = read_lats(f"{tmp_path}/o.ark")["u1"]
    assert out.arcs[out.start][0].weight[1] == pytest.approx(3.5,
                                                             abs=1e-5)


def test_kws_pipeline(tmp_path, capsys):
    # utt1 says [5 6], utt2 says [7]; search for "5 6" and "7"
    write_lats(f"{tmp_path}/l1.ark", [("utt1", linear([5, 6], 0.0))])
    write_lats(f"{tmp_path}/l2.ark", [("utt2", linear([7], 0.0))])
    for i in (1, 2):
        rc = get_tool("lattice-to-kws-index")([
            "lattice-to-kws-index", f"ark:{tmp_path}/l{i}.ark",
            f"{tmp_path}/{i}.idx"])
        assert rc == 0
    rc = get_tool("kws-index-union")([
        "kws-index-union", f"{tmp_path}/all.idx",
        f"{tmp_path}/1.idx", f"{tmp_path}/2.idx"])
    assert rc == 0
    with TableWriter("int-vector", f"ark:{tmp_path}/kw.ark") as w:
        w.write("KW1", np.asarray([5, 6], np.int32))
        w.write("KW2", np.asarray([7], np.int32))
        w.write("KW3", np.asarray([9], np.int32))
    rc = get_tool("kws-search")([
        "kws-search", f"{tmp_path}/all.idx", f"ark:{tmp_path}/kw.ark",
        f"{tmp_path}/hits.txt"])
    assert rc == 0
    hits = (tmp_path / "hits.txt").read_text().splitlines()
    assert any(h.startswith("KW1 utt1") for h in hits)
    assert any(h.startswith("KW2 utt2") for h in hits)
    assert not any(h.startswith("KW3") for h in hits)
    # perfect hyp -> ATWV 1.0; empty hyp -> 0 found, ATWV 0
    (tmp_path / "ref.txt").write_text("\n".join(hits) + "\n")
    rc = get_tool("compute-atwv")([
        "compute-atwv", "100.0", f"{tmp_path}/ref.txt",
        f"{tmp_path}/hits.txt"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ATWV = 1.0000" in out
    (tmp_path / "none.txt").write_text("")
    rc = get_tool("compute-atwv")([
        "compute-atwv", "100.0", f"{tmp_path}/ref.txt",
        f"{tmp_path}/none.txt"])
    assert rc == 0
    assert "ATWV = 0.0000" in capsys.readouterr().out


def test_kws_pipeline_factor_transducer(tmp_path):
    """Same pipeline through --index-type=factor (the reference's
    timed-factor-transducer index, kws/kws-functions.h)."""
    write_lats(f"{tmp_path}/l1.ark", [("utt1", linear([5, 6], 0.0))])
    write_lats(f"{tmp_path}/l2.ark", [("utt2", linear([7], 0.0))])
    for i in (1, 2):
        rc = get_tool("lattice-to-kws-index")([
            "lattice-to-kws-index", "--index-type=factor",
            f"ark:{tmp_path}/l{i}.ark", f"{tmp_path}/{i}.idx"])
        assert rc == 0
    rc = get_tool("kws-index-union")([
        "kws-index-union", f"{tmp_path}/all.idx",
        f"{tmp_path}/1.idx", f"{tmp_path}/2.idx"])
    assert rc == 0
    with TableWriter("int-vector", f"ark:{tmp_path}/kw.ark") as w:
        w.write("KW1", np.asarray([5, 6], np.int32))
        w.write("KW2", np.asarray([7], np.int32))
        w.write("KW3", np.asarray([9], np.int32))
    rc = get_tool("kws-search")([
        "kws-search", f"{tmp_path}/all.idx", f"ark:{tmp_path}/kw.ark",
        f"{tmp_path}/hits.txt"])
    assert rc == 0
    hits = (tmp_path / "hits.txt").read_text().splitlines()
    assert any(h.startswith("KW1 utt1") for h in hits)
    assert any(h.startswith("KW2 utt2") for h in hits)
    assert not any(h.startswith("KW3") for h in hits)
    # posteriors are exact (single-path lattices): score == 1
    for h in hits:
        assert float(h.split()[-1]) == pytest.approx(1.0, abs=1e-4)
