"""Round-3 CLI tail tools: EER, bootstrap WER CI, diarization
clustering, i-vector post-processing, lattice-combine, discriminative
egs surface."""

import numpy as np
import pytest

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def test_compute_eer(tmp_path, capsys):
    rng = np.random.default_rng(0)
    lines = []
    for s in rng.normal(2.0, 1.0, 200):
        lines.append(f"{s:.4f} target")
    for s in rng.normal(-2.0, 1.0, 200):
        lines.append(f"{s:.4f} nontarget")
    p = tmp_path / "scores.txt"
    p.write_text("\n".join(lines) + "\n")
    assert get_tool("compute-eer")(["compute-eer", str(p)]) == 0
    out = capsys.readouterr().out
    eer = float(out.strip().rstrip("%"))
    assert 0.0 < eer < 10.0         # well-separated -> low EER


def test_compute_wer_bootci(tmp_path, capsys):
    rng = np.random.default_rng(1)
    with TableWriter("int-vector", f"ark:{tmp_path}/ref.ark") as w:
        for i in range(30):
            w.write(f"u{i:02d}", rng.integers(1, 9, 8).tolist())
    with TableWriter("int-vector", f"ark:{tmp_path}/hyp.ark") as w:
        for key, ref in SequentialTableReader(
                "int-vector", f"ark:{tmp_path}/ref.ark"):
            hyp = list(ref)
            if rng.random() < 0.5:
                hyp[2] = 0          # one substitution half the time
            w.write(key, hyp)
    rc = get_tool("compute-wer-bootci")(
        ["compute-wer-bootci", f"ark:{tmp_path}/ref.ark",
         f"ark:{tmp_path}/hyp.ark"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "%WER" in out and "Conf Interval" in out


def test_ivector_mean_and_length(tmp_path):
    rng = np.random.default_rng(2)
    with TableWriter("vector", f"ark:{tmp_path}/iv.ark") as w:
        for i in range(10):
            w.write(f"s{i}", rng.normal(1.0, 1.0, 16).astype(np.float32))
    rc = get_tool("ivector-subtract-global-mean")(
        ["ivector-subtract-global-mean", f"ark:{tmp_path}/iv.ark",
         f"ark:{tmp_path}/c.ark"])
    assert rc == 0
    vecs = [v for _, v in SequentialTableReader(
        "vector", f"ark:{tmp_path}/c.ark")]
    np.testing.assert_allclose(np.mean(vecs, 0), 0.0, atol=1e-5)
    rc = get_tool("ivector-normalize-length")(
        ["ivector-normalize-length", f"ark:{tmp_path}/c.ark",
         f"ark:{tmp_path}/n.ark"])
    assert rc == 0
    for _, v in SequentialTableReader("vector", f"ark:{tmp_path}/n.ark"):
        assert abs(np.linalg.norm(v) - np.sqrt(v.size)) < 1e-4


def test_agglomerative_cluster(tmp_path):
    # two clear blocks in the score matrix
    S = np.full((6, 6), -5.0, np.float32)
    S[:3, :3] = 5.0
    S[3:, 3:] = 5.0
    with TableWriter("matrix", f"ark:{tmp_path}/sc.ark") as w:
        w.write("reco1", S)
    with TableWriter("token-vector", f"ark:{tmp_path}/r2u.ark") as w:
        w.write("reco1", [f"utt{i}" for i in range(6)])
    rc = get_tool("agglomerative-cluster")(
        ["agglomerative-cluster", "--threshold=0.0",
         f"ark:{tmp_path}/sc.ark", f"ark:{tmp_path}/r2u.ark",
         f"ark:{tmp_path}/lab.ark"])
    assert rc == 0
    labels = {k: v[0] for k, v in SequentialTableReader(
        "int-vector", f"ark:{tmp_path}/lab.ark")}
    assert len(labels) == 6
    assert labels["utt0"] == labels["utt1"] == labels["utt2"]
    assert labels["utt3"] == labels["utt4"] == labels["utt5"]
    assert labels["utt0"] != labels["utt3"]


def test_plda_scoring_dense(tmp_path):
    from kaldi_tpu.ivector.plda import train_plda
    rng = np.random.default_rng(3)
    dim = 8
    # two classes with distinct means
    classes = {}
    for c in range(8):
        mu = rng.normal(0, 6.0, dim)
        classes[f"c{c}"] = [mu + rng.normal(0, 0.5, dim)
                            for _ in range(8)]
    plda = train_plda(classes)
    from kaldi_tpu.util.kaldi_io import write_kaldi_object
    write_kaldi_object(plda.write, str(tmp_path / "plda"))
    # recording with 2 utts of one class + 2 of another
    mu_a, mu_b = rng.normal(0, 6.0, dim), rng.normal(0, 6.0, dim)
    with TableWriter("vector", f"ark:{tmp_path}/iv.ark") as w:
        w.write("a1", (mu_a + rng.normal(0, 0.5, dim)).astype(np.float32))
        w.write("a2", (mu_a + rng.normal(0, 0.5, dim)).astype(np.float32))
        w.write("b1", (mu_b + rng.normal(0, 0.5, dim)).astype(np.float32))
        w.write("b2", (mu_b + rng.normal(0, 0.5, dim)).astype(np.float32))
    with TableWriter("token-vector", f"ark:{tmp_path}/r2u.ark") as w:
        w.write("rec", ["a1", "a2", "b1", "b2"])
    rc = get_tool("ivector-plda-scoring-dense")(
        ["ivector-plda-scoring-dense", str(tmp_path / "plda"),
         f"ark:{tmp_path}/r2u.ark", f"ark:{tmp_path}/iv.ark",
         f"ark:{tmp_path}/S.ark"])
    assert rc == 0
    S = dict(SequentialTableReader("matrix",
                                   f"ark:{tmp_path}/S.ark"))["rec"]
    assert S.shape == (4, 4)
    assert S[0, 1] > S[0, 2] and S[2, 3] > S[1, 2]


def test_lattice_combine(tmp_path):
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    from kaldi_tpu.lat.functions import lattice_nbest
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder

    def linear(words, cost):
        lat = VectorFst(LatticeWeight)
        s = lat.add_state()
        lat.set_start(s)
        for i, wd in enumerate(words):
            ns = lat.add_state()
            lat.add_arc(s, Arc(i + 1, wd, (cost if i == 0 else 0.0,
                                           0.0), ns))
            s = ns
        lat.set_final(s, (0.0, 0.0))
        return lat

    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/a.ark") as w:
        w.write("u1", linear([5, 6], 1.0))
    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/b.ark") as w:
        w.write("u1", linear([7], 2.0))
    rc = get_tool("lattice-combine")(
        ["lattice-combine", f"ark:{tmp_path}/a.ark",
         f"ark:{tmp_path}/b.ark", f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    lat = dict(SequentialTableReader(LatticeHolder(),
                                     f"ark:{tmp_path}/o.ark"))["u1"]
    paths = lattice_nbest(lat, 5)
    words = sorted(tuple(p[1]) for p in paths)
    assert (5, 6) in words and (7,) in words


def test_discriminative_egs_round_trip(tmp_path):
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.nnet3.egs import DiscriminativeExampleHolder
    rng = np.random.default_rng(4)
    T, D = 40, 6
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", rng.normal(size=(T, D)).astype(np.float32))
    with TableWriter("int-vector", f"ark:{tmp_path}/ali.ark") as w:
        w.write("u1", rng.integers(1, 9, T).tolist())
    lat = VectorFst(LatticeWeight)
    s0, s1 = lat.add_state(), lat.add_state()
    lat.set_start(s0)
    lat.add_arc(s0, Arc(1, 3, (0.5, 1.0), s1))
    lat.set_final(s1, (0.0, 0.0))
    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/lat.ark") as w:
        w.write("u1", lat)
    rc = get_tool("nnet3-discriminative-get-egs")(
        ["nnet3-discriminative-get-egs", "--num-frames=20",
         "--left-context=3", "--right-context=3",
         f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/ali.ark",
         f"ark:{tmp_path}/lat.ark", f"ark:{tmp_path}/egs.ark"])
    assert rc == 0
    egs = list(SequentialTableReader(DiscriminativeExampleHolder(),
                                     f"ark:{tmp_path}/egs.ark"))
    assert len(egs) == 2
    key, eg = egs[0]
    assert eg.feats.shape[1] == D
    assert len(eg.num_ali) == 20
    assert eg.den_lat.num_states >= 2
    # round-robin copy split
    rc = get_tool("nnet3-discriminative-copy-egs")(
        ["nnet3-discriminative-copy-egs", f"ark:{tmp_path}/egs.ark",
         f"ark:{tmp_path}/e1.ark", f"ark:{tmp_path}/e2.ark"])
    assert rc == 0
    n1 = len(list(SequentialTableReader(DiscriminativeExampleHolder(),
                                        f"ark:{tmp_path}/e1.ark")))
    n2 = len(list(SequentialTableReader(DiscriminativeExampleHolder(),
                                        f"ark:{tmp_path}/e2.ark")))
    assert n1 + n2 == 2


def test_vector_scale(tmp_path):
    with TableWriter("vector", f"ark:{tmp_path}/v.ark") as w:
        w.write("k", np.asarray([1.0, 2.0], np.float32))
    rc = get_tool("vector-scale")(
        ["vector-scale", "--scale=-0.5", f"ark:{tmp_path}/v.ark",
         f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    v = dict(SequentialTableReader("vector", f"ark:{tmp_path}/o.ark"))
    np.testing.assert_allclose(v["k"], [-0.5, -1.0])
