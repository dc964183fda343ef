"""Round-2 CLI tail: latbin/featbin equivalents exercised through the
dispatcher on real archives (parity: same-named src/latbin and
src/featbin tools)."""

import numpy as np
import pytest

from kaldi_tpu.cli import get_tool
from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
from kaldi_tpu.lat.functions import lattice_best_path
from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
from kaldi_tpu.util.table import (MatrixHolder, SequentialTableReader,
                                  TableWriter)
from tests.test_lattice_properties import random_lattice


def run(tool, *args):
    return get_tool(tool)([tool] + [str(a) for a in args])


@pytest.fixture
def lat_ark(tmp_path):
    rng = np.random.default_rng(0)
    lats = {f"utt{i}": random_lattice(rng, T=4, width=3, num_words=4)
            for i in range(3)}
    w = TableWriter(LatticeHolder(), f"ark:{tmp_path}/in.lats")
    for k, v in lats.items():
        w.write(k, v)
    w.close()
    return tmp_path, lats


class TestLatTail:
    def test_union_contains_both_best_paths(self, lat_ark, tmp_path):
        d, lats = lat_ark
        rng = np.random.default_rng(5)
        other = {k: random_lattice(rng, T=4, width=3, num_words=4)
                 for k in lats}
        w = TableWriter(LatticeHolder(), f"ark:{d}/b.lats")
        for k, v in other.items():
            w.write(k, v)
        w.close()
        assert run("lattice-union", f"ark:{d}/in.lats", f"ark:{d}/b.lats",
                   f"ark:{d}/u.lats") == 0
        got = dict(SequentialTableReader(LatticeHolder(),
                                         f"ark:{d}/u.lats"))
        for k in lats:
            _a, w1, c1 = lattice_best_path(lats[k])
            _a, w2, c2 = lattice_best_path(other[k])
            _a, wu, cu = lattice_best_path(got[k])
            assert cu == pytest.approx(min(c1, c2), abs=1e-4)

    def test_reverse_round_trip_preserves_best_cost(self, lat_ark):
        d, lats = lat_ark
        assert run("lattice-reverse", f"ark:{d}/in.lats",
                   f"ark:{d}/r.lats") == 0
        got = dict(SequentialTableReader(LatticeHolder(),
                                         f"ark:{d}/r.lats"))
        for k in lats:
            _a, w, c = lattice_best_path(lats[k])
            _a, wr, cr = lattice_best_path(got[k])
            assert cr == pytest.approx(c, abs=1e-4)
            assert wr == w[::-1]

    def test_project_and_to_fst(self, lat_ark):
        d, lats = lat_ark
        assert run("lattice-project", f"ark:{d}/in.lats",
                   f"ark:{d}/p.lats") == 0
        got = dict(SequentialTableReader(LatticeHolder(),
                                         f"ark:{d}/p.lats"))
        for k in lats:
            for s in range(got[k].num_states):
                for a in got[k].arcs[s]:
                    assert a.ilabel == a.olabel
        assert run("lattice-to-fst", "--lm-scale=1.0",
                   "--acoustic-scale=1.0", f"ark:{d}/in.lats",
                   f"ark:{d}/f.fsts") == 0

    def test_depth_and_limit_depth(self, lat_ark):
        d, lats = lat_ark
        assert run("lattice-depth-per-frame", f"ark:{d}/in.lats",
                   f"ark,t:{d}/depth.txt") == 0
        assert run("lattice-limit-depth", "--max-arcs-per-frame=2",
                   f"ark:{d}/in.lats", f"ark:{d}/lim.lats") == 0
        got = dict(SequentialTableReader(LatticeHolder(),
                                         f"ark:{d}/lim.lats"))
        for k in lats:
            # best path survives depth limiting
            _a, w, c = lattice_best_path(lats[k])
            _a, wl, cl = lattice_best_path(got[k])
            assert cl == pytest.approx(c, abs=1e-4)

    def test_arc_post_and_confidence(self, lat_ark):
        d, lats = lat_ark
        assert run("lattice-arc-post", f"ark:{d}/in.lats",
                   f"{d}/post.txt") == 0
        txt = open(f"{d}/post.txt").read()
        assert txt and all(len(l.split()) == 5
                           for l in txt.strip().splitlines())
        assert run("lattice-confidence", f"ark:{d}/in.lats",
                   f"ark,t:{d}/conf.txt") == 0

    def test_equivalent(self, lat_ark):
        d, _ = lat_ark
        assert run("lattice-equivalent", f"ark:{d}/in.lats",
                   f"ark:{d}/in.lats") == 0

    def test_linear_to_nbest_and_ctm(self, tmp_path):
        d = tmp_path
        w = TableWriter("int-vector", f"ark:{d}/ali.ark")
        w.write("u1", [3, 3, 4, 4, 4, 5])
        w.close()
        w = TableWriter("int-vector", f"ark:{d}/words.ark")
        w.write("u1", [7, 8])
        w.close()
        assert run("linear-to-nbest", f"ark:{d}/ali.ark",
                   f"ark:{d}/words.ark", "", "",
                   f"ark:{d}/nb.lats") == 0
        got = dict(SequentialTableReader(LatticeHolder(),
                                         f"ark:{d}/nb.lats"))
        ali, words, _c = lattice_best_path(got["u1"])
        assert words == [7, 8]
        assert ali == [3, 3, 4, 4, 4, 5]
        assert run("nbest-to-ctm", f"ark:{d}/nb.lats",
                   f"{d}/out.ctm") == 0
        ctm = open(f"{d}/out.ctm").read().strip().splitlines()
        assert len(ctm) == 2 and ctm[0].split()[4] == "7"


class TestFeatTail:
    @pytest.fixture
    def feats_ark(self, tmp_path):
        rng = np.random.default_rng(1)
        m = {f"utt{i}": rng.normal(size=(10 + i, 4)).astype(np.float32)
             for i in range(2)}
        w = TableWriter(MatrixHolder(), f"ark:{tmp_path}/f.ark")
        for k, v in m.items():
            w.write(k, v)
        w.close()
        return tmp_path, m

    def test_shift_and_subsample(self, feats_ark):
        d, m = feats_ark
        assert run("shift-feats", "--shift=2", f"ark:{d}/f.ark",
                   f"ark:{d}/s.ark") == 0
        got = dict(SequentialTableReader(MatrixHolder(),
                                         f"ark:{d}/s.ark"))
        np.testing.assert_allclose(got["utt0"][2:], m["utt0"][:-2])
        np.testing.assert_allclose(got["utt0"][0], m["utt0"][0])
        assert run("subsample-feats", "--n=2", f"ark:{d}/f.ark",
                   f"ark:{d}/ss.ark") == 0
        got = dict(SequentialTableReader(MatrixHolder(),
                                         f"ark:{d}/ss.ark"))
        np.testing.assert_allclose(got["utt0"], m["utt0"][::2])

    def test_compare_and_append_vector(self, feats_ark):
        d, m = feats_ark
        assert run("compare-feats", f"ark:{d}/f.ark",
                   f"ark:{d}/f.ark") == 0
        w = TableWriter("vector", f"ark:{d}/v.ark")
        for k in m:
            w.write(k, np.ones(2, np.float32))
        w.close()
        assert run("append-vector-to-feats", f"ark:{d}/f.ark",
                   f"ark:{d}/v.ark", f"ark:{d}/av.ark") == 0
        got = dict(SequentialTableReader(MatrixHolder(),
                                         f"ark:{d}/av.ark"))
        assert got["utt0"].shape == (10, 6)
        np.testing.assert_allclose(got["utt0"][:, 4:], 1.0)

    def test_concat(self, feats_ark, tmp_path):
        d, m = feats_ark
        import kaldi_tpu.base.io_funcs as iof
        for name, arr in (("a.mat", m["utt0"]), ("b.mat", m["utt1"])):
            with open(f"{d}/{name}", "wb") as f:
                iof.init_output_stream(f, True)
                iof.write_matrix(f, True, arr)
        assert run("concat-feats", f"{d}/a.mat", f"{d}/b.mat",
                   f"{d}/c.mat") == 0
        with open(f"{d}/c.mat", "rb") as f:
            binary = iof.init_input_stream(f)
            out = iof.read_matrix(f, binary)
        assert out.shape[0] == m["utt0"].shape[0] + m["utt1"].shape[0]

    def test_post_to_feats(self, tmp_path):
        d = tmp_path
        w = TableWriter("posterior", f"ark:{d}/p.ark")
        w.write("u1", [[(0, 0.5), (2, 0.5)], [(1, 1.0)]])
        w.close()
        assert run("post-to-feats", "--post-dim=3", f"ark:{d}/p.ark",
                   f"ark:{d}/pf.ark") == 0
        got = dict(SequentialTableReader(MatrixHolder(),
                                         f"ark:{d}/pf.ark"))
        np.testing.assert_allclose(got["u1"],
                                   [[0.5, 0, 0.5], [0, 1, 0]])

    def test_extract_feature_segments(self, feats_ark):
        d, m = feats_ark
        with open(f"{d}/segments", "w") as f:
            f.write("seg1 utt0 0.02 0.07\n")
        assert run("extract-feature-segments", "--min-segment-length=0.01",
                   f"ark:{d}/f.ark", f"{d}/segments",
                   f"ark:{d}/seg.ark") == 0
        got = dict(SequentialTableReader(MatrixHolder(),
                                         f"ark:{d}/seg.ark"))
        np.testing.assert_allclose(got["seg1"], m["utt0"][2:7])


class TestComposeFamily:
    def test_push_preserves_path_costs(self, lat_ark):
        d, lats = lat_ark
        assert run("lattice-push", f"ark:{d}/in.lats",
                   f"ark:{d}/push.lats") == 0
        got = dict(SequentialTableReader(LatticeHolder(),
                                         f"ark:{d}/push.lats"))
        for k in lats:
            _a, w, c = lattice_best_path(lats[k])
            _a, wp, cp = lattice_best_path(got[k])
            assert wp == w and cp == pytest.approx(c, abs=1e-3)

    def test_compose_with_word_acceptor(self, lat_ark, tmp_path):
        d, lats = lat_ark
        # unweighted sigma-free acceptor over all words 1..4 (a loop)
        from kaldi_tpu.fstext.fst import TropicalWeight
        from kaldi_tpu.fstext.openfst_io import write_fst
        acc = VectorFst(TropicalWeight)
        s = acc.add_state()
        acc.set_start(s)
        acc.set_final(s, 0.0)
        for w in range(1, 5):
            acc.add_arc(s, Arc(w, w, 0.25, s))
        with open(f"{d}/acc.fst", "wb") as f:
            write_fst(f, acc)
        assert run("lattice-compose", f"ark:{d}/in.lats",
                   f"{d}/acc.fst", f"ark:{d}/comp.lats") == 0
        got = dict(SequentialTableReader(LatticeHolder(),
                                         f"ark:{d}/comp.lats"))
        for k in lats:
            _a, w, c = lattice_best_path(lats[k])
            _a, wc, cc = lattice_best_path(got[k])
            # each word adds 0.25 graph cost; best path may change, so
            # compare against brute-force over the original lattice
            from tests.test_lattice_properties import _all_paths
            want = min(cost + 0.25 * len(words)
                       for words, cost in _all_paths(lats[k]))
            assert cc == pytest.approx(want, abs=1e-3)

    def test_interp_self_is_identity_cost(self, lat_ark):
        d, lats = lat_ark
        assert run("lattice-interp", "--alpha=0.5", f"ark:{d}/in.lats",
                   f"ark:{d}/in.lats", f"ark:{d}/int.lats") == 0
        got = dict(SequentialTableReader(LatticeHolder(),
                                         f"ark:{d}/int.lats"))
        for k in lats:
            _a, w, c = lattice_best_path(lats[k])
            _a, wi, ci = lattice_best_path(got[k])
            # interpolating a lattice with itself keeps best cost
            assert ci == pytest.approx(c, abs=1e-3)


class TestPitchCli:
    def test_pitch_pipeline(self, tmp_path):
        from kaldi_tpu.feat.wave import WaveData
        from kaldi_tpu.util.table import WaveHolder
        d = tmp_path
        rng = np.random.default_rng(2)
        fs = 8000.0
        t = np.arange(int(0.5 * fs)) / fs
        wav = (4000 * np.sin(2 * np.pi * 150.0 * t)
               + 100 * rng.normal(size=len(t))).astype(np.float32)
        w = TableWriter(WaveHolder(), f"ark:{d}/wav.ark")
        w.write("u1", WaveData(fs, wav))
        w.close()
        assert run("compute-kaldi-pitch-feats", f"ark:{d}/wav.ark",
                   f"ark:{d}/pitch.ark") == 0
        got = dict(SequentialTableReader(MatrixHolder(),
                                         f"ark:{d}/pitch.ark"))
        assert got["u1"].shape[1] == 2
        # 150 Hz tone recovered within 10%
        med = float(np.median(got["u1"][:, 1]))
        assert abs(med - 150.0) < 15.0, med
        assert run("process-kaldi-pitch-feats", f"ark:{d}/pitch.ark",
                   f"ark:{d}/pp.ark") == 0
        got2 = dict(SequentialTableReader(MatrixHolder(),
                                          f"ark:{d}/pp.ark"))
        assert got2["u1"].shape[0] == got["u1"].shape[0]
        assert got2["u1"].shape[1] >= 2


class TestFeatTail2:
    def test_modify_cmvn_stats(self, tmp_path):
        d = tmp_path
        rng = np.random.default_rng(4)
        x = rng.normal(loc=3.0, scale=2.0, size=(50, 3))
        stats = np.zeros((2, 4))
        stats[0, :3] = x.sum(0)
        stats[0, 3] = len(x)
        stats[1, :3] = (x * x).sum(0)
        w = TableWriter(MatrixHolder(), f"ark:{d}/c.ark")
        w.write("spk1", stats.astype(np.float64))
        w.close()
        assert run("modify-cmvn-stats", "--norm-vars=false",
                   f"ark:{d}/c.ark", f"ark:{d}/cm.ark") == 0
        got = dict(SequentialTableReader(MatrixHolder(),
                                         f"ark:{d}/cm.ark"))["spk1"]
        n = got[0, 3]
        mean = got[0, :3] / n
        var = got[1, :3] / n - mean ** 2
        np.testing.assert_allclose(var, 1.0, rtol=1e-4)

    def test_interpolate_pitch(self, tmp_path):
        d = tmp_path
        feats = np.array([[0.9, 100.0], [0.01, 555.0], [0.9, 200.0]],
                         np.float32)
        w = TableWriter(MatrixHolder(), f"ark:{d}/p.ark")
        w.write("u1", feats)
        w.close()
        assert run("interpolate-pitch", f"ark:{d}/p.ark",
                   f"ark:{d}/pi.ark") == 0
        got = dict(SequentialTableReader(MatrixHolder(),
                                         f"ark:{d}/pi.ark"))["u1"]
        assert got[1, 1] == pytest.approx(150.0)   # midpoint

    def test_compose_transforms(self, tmp_path):
        import kaldi_tpu.base.io_funcs as iof
        d = tmp_path
        rng = np.random.default_rng(6)
        A = rng.normal(size=(2, 4)).astype(np.float32)   # affine 3->2
        B = rng.normal(size=(3, 4)).astype(np.float32)   # affine 3->3
        for name, M in (("A.mat", A), ("B.mat", B)):
            with open(f"{d}/{name}", "wb") as f:
                iof.init_output_stream(f, True)
                iof.write_matrix(f, True, M)
        assert run("compose-transforms", f"{d}/A.mat", f"{d}/B.mat",
                   f"{d}/C.mat") == 0
        with open(f"{d}/C.mat", "rb") as f:
            binary = iof.init_input_stream(f)
            C = iof.read_matrix(f, binary)
        x = rng.normal(size=3).astype(np.float32)
        xb = B[:, :3] @ x + B[:, 3]
        want = A[:, :3] @ xb + A[:, 3]
        got = C[:, :3] @ x + C[:, 3]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
