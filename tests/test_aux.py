"""Auxiliary subsystems: CTM/word times, KWS index, NG preconditioner,
orbax checkpointing, objective logging."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
from kaldi_tpu.kws import KwsIndex
from kaldi_tpu.lat.word_align import (best_path_word_times, format_ctm,
                                      lattice_to_ctm)
from kaldi_tpu.nnet3.natural_gradient import online_natural_gradient
from kaldi_tpu.parallel.checkpoint import (ObjectiveInfo, restore_checkpoint,
                                           save_checkpoint)


def timed_lattice():
    """Linear lattice: word 1 over frames 0-2, word 2 over frames 2-5."""
    lat = VectorFst(LatticeWeight)
    s = [lat.add_state() for _ in range(6)]
    lat.set_start(s[0])
    lat.add_arc(s[0], Arc(101, 1, (0.1, 0.2), s[1]))
    lat.add_arc(s[1], Arc(102, 0, (0.0, 0.1), s[2]))
    lat.add_arc(s[2], Arc(103, 2, (0.1, 0.1), s[3]))
    lat.add_arc(s[3], Arc(104, 0, (0.0, 0.1), s[4]))
    lat.add_arc(s[4], Arc(105, 0, (0.0, 0.1), s[5]))
    lat.set_final(s[5], (0.0, 0.0))
    return lat


class TestCtm:
    def test_word_times(self):
        times = best_path_word_times(timed_lattice(), None)
        assert times == [(1, 0, 2), (2, 2, 5)]

    def test_ctm_output(self):
        entries = lattice_to_ctm(timed_lattice(), None, "utt1")
        assert len(entries) == 2
        assert entries[0].start == pytest.approx(0.0)
        assert entries[0].duration == pytest.approx(0.02)
        assert entries[1].start == pytest.approx(0.02)
        text = format_ctm(entries, {1: "YES", 2: "NO"})
        assert "YES" in text and "NO" in text


class TestKws:
    def test_index_and_search(self):
        idx = KwsIndex()
        idx.add_lattice("utt1", timed_lattice())
        hits = idx.search([1])
        assert hits and hits[0].utt == "utt1"
        assert hits[0].score == pytest.approx(1.0, abs=1e-5)
        # multiword
        hits2 = idx.search([1, 2])
        assert hits2 and hits2[0].end_frame >= hits2[0].start_frame
        assert idx.search([999]) == []


class TestNaturalGradient:
    def test_preconditions_and_preserves_norm(self):
        rng = np.random.default_rng(0)
        params = {"w": jnp.asarray(rng.normal(size=(16, 32)), jnp.float32),
                  "b": jnp.zeros(32)}
        tx = online_natural_gradient()
        state = tx.init(params)
        # correlated gradient: rank-deficient covariance
        g = jnp.asarray(np.outer(rng.normal(size=16),
                                 rng.normal(size=32)), jnp.float32)
        grads = {"w": g, "b": jnp.ones(32)}
        new_grads, state = tx.update(grads, state)
        # norm preserved for w, b untouched
        assert float(jnp.linalg.norm(new_grads["w"])) == pytest.approx(
            float(jnp.linalg.norm(g)), rel=1e-3)
        np.testing.assert_array_equal(np.asarray(new_grads["b"]),
                                      np.ones(32))
        # second call with same grad: whitening spreads the spectrum
        new2, state = tx.update(grads, state)
        s_orig = np.linalg.svd(np.asarray(g), compute_uv=False)
        s_new = np.linalg.svd(np.asarray(new2["w"]), compute_uv=False)
        ratio_orig = s_orig[0] / max(s_orig[1], 1e-6)
        ratio_new = s_new[0] / max(s_new[1], 1e-6)
        assert ratio_new <= ratio_orig + 1e-3

    def test_composes_with_sgd(self):
        params = {"w": jnp.ones((4, 8))}
        tx = optax.chain(online_natural_gradient(), optax.sgd(0.1))
        state = tx.init(params)
        updates, state = tx.update({"w": jnp.ones((4, 8))}, state)
        assert np.isfinite(np.asarray(updates["w"])).all()


class TestCheckpoint:
    def test_save_restore(self, tmp_path):
        state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
                 "step": jnp.asarray(7)}
        save_checkpoint(str(tmp_path), state, 7, extra={"egs_pos": 123})
        template = jax.tree.map(np.zeros_like, state)
        got, extra, step = restore_checkpoint(str(tmp_path), template)
        assert step == 7
        assert extra == {"egs_pos": 123}
        np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                      np.arange(6.0).reshape(2, 3))

    def test_objective_info(self, capsys):
        info = ObjectiveInfo("output", interval=2)
        for _ in range(4):
            info.update(-0.5, 100)
        avg = info.print_total()
        assert avg == pytest.approx(-0.5)


class TestClusteringAndOnlineIvector:
    def test_agglomerative_clustering(self):
        from kaldi_tpu.ivector.cluster import cluster_embeddings
        rng = np.random.default_rng(0)
        a = rng.normal(size=8) ; b = rng.normal(size=8)
        embs = np.stack([a + 0.05 * rng.normal(size=8) for _ in range(3)]
                        + [b + 0.05 * rng.normal(size=8) for _ in range(3)])
        ids = cluster_embeddings(embs, num_clusters=2)
        assert len(set(ids[:3])) == 1 and len(set(ids[3:])) == 1
        assert ids[0] != ids[3]

    def test_online_ivector_feature(self):
        from kaldi_tpu.gmm.diag_gmm import DiagGmm
        from kaldi_tpu.ivector import IvectorExtractor
        from kaldi_tpu.online.ivector_feature import (
            OnlineIvectorAdaptationState, OnlineIvectorFeature)
        rng = np.random.default_rng(1)
        ubm = DiagGmm(2, 4)
        ubm.set_from_means_and_vars([0.5, 0.5], rng.normal(size=(2, 4)),
                                    np.ones((2, 4)))
        ex = IvectorExtractor(ubm, 3)

        class FakeSrc:
            feats = rng.normal(size=(40, 4)).astype(np.float32)
            def dim(self): return 4
            def num_frames_ready(self): return 40
            def is_last_frame(self, f): return f == 39
            def get_frame(self, t): return self.feats[t]

        feat = OnlineIvectorFeature(ex, FakeSrc())
        iv0 = feat.get_frame(0)
        iv_late = feat.get_frame(39)
        assert iv0.shape == (3,)
        assert not np.allclose(iv0, iv_late)  # stats accumulate
        state = feat.get_adaptation_state()
        # next utterance starts from carried stats
        feat2 = OnlineIvectorFeature(ex, FakeSrc(), adaptation_state=state)
        assert feat2.stats.num_frames > 0

    def test_task_sequencer(self):
        from kaldi_tpu.util.profile import TaskSequencer
        import time as _time
        order = []
        with TaskSequencer(num_threads=3) as seq:
            for i in range(5):
                seq.run(lambda x=i: (_time.sleep(0.01 * (5 - x)), x)[1],
                        callback=order.append)
        assert order == [0, 1, 2, 3, 4]  # results in submission order


class TestLangDir:
    def test_write_read_roundtrip(self, tmp_path):
        from kaldi_tpu.decoder.graph import Lang
        from kaldi_tpu.decoder.lang_dir import (read_lang_dir,
                                                write_lang_dir)
        lang = Lang({"YES": [["Y"]], "NO": [["N"]], "MAYBE": [["M", "B"]]},
                    sil_phone="SIL", sil_prob=0.5)
        lang.make_topology()
        d = str(tmp_path / "lang")
        write_lang_dir(lang, d)
        phones, words, topo, L, disambig = read_lang_dir(d)
        assert words["YES"] == lang.words["YES"]
        assert phones["SIL"] == lang.phones["SIL"]
        assert topo.num_pdf_classes(lang.phones["SIL"]) == 5
        assert L.num_states > 0
        assert disambig  # at least #0
        # L_disambig.fst is raw OpenFst binary
        import struct
        from kaldi_tpu.fstext.openfst_io import FST_MAGIC
        with open(f"{d}/L_disambig.fst", "rb") as f:
            assert struct.unpack("<i", f.read(4))[0] == FST_MAGIC


class TestNaturalGradientLowRank:
    def test_lowrank_matches_dense_on_lowrank_covariance(self):
        """When the gradient covariance truly has rank <= R, the
        low-rank estimator converges to the same preconditioning as
        the dense path."""
        rng = np.random.default_rng(1)
        D, N, R = 24, 40, 8
        U = rng.normal(size=(D, 4))  # true rank-4 structure
        params = {"w": jnp.zeros((D, N), jnp.float32)}
        tx_lr = online_natural_gradient(rank=R)
        tx_d = online_natural_gradient(rank=None)
        st_lr = tx_lr.init(params)
        st_d = tx_d.init(params)
        g = None
        for _ in range(60):
            g = jnp.asarray(U @ rng.normal(size=(4, N)), jnp.float32)
            out_lr, st_lr = tx_lr.update({"w": g}, st_lr)
            out_d, st_d = tx_d.update({"w": g}, st_d)
        a = np.asarray(out_lr["w"]).ravel()
        b = np.asarray(out_d["w"]).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.95

    def test_lowrank_norm_preserved_and_finite(self):
        rng = np.random.default_rng(2)
        params = {"w": jnp.zeros((64, 100), jnp.float32)}
        tx = online_natural_gradient(rank=8)
        st = tx.init(params)
        for _ in range(5):
            g = jnp.asarray(rng.normal(size=(64, 100)), jnp.float32)
            out, st = tx.update({"w": g}, st)
            assert np.isfinite(np.asarray(out["w"])).all()
            assert float(jnp.linalg.norm(out["w"])) == pytest.approx(
                float(jnp.linalg.norm(g)), rel=1e-3)

    def test_lowrank_downweights_dominant_direction(self):
        """Gradients with one dominant repeated direction: after the
        basis adapts, that direction is damped relative to fresh
        orthogonal components (the whole point of NG-SGD)."""
        rng = np.random.default_rng(3)
        D, N = 32, 50
        u = rng.normal(size=D)
        u /= np.linalg.norm(u)
        params = {"w": jnp.zeros((D, N), jnp.float32)}
        tx = online_natural_gradient(rank=4, alpha=0.1)
        st = tx.init(params)
        for _ in range(50):
            g = jnp.asarray(np.outer(u * 10, rng.normal(size=N))
                            + 0.1 * rng.normal(size=(D, N)), jnp.float32)
            out, st = tx.update({"w": g}, st)
        pg = np.asarray(out["w"])
        g_np = np.asarray(g)
        # relative energy along u must shrink after preconditioning
        along_g = np.linalg.norm(u @ g_np) / np.linalg.norm(g_np)
        along_pg = np.linalg.norm(u @ pg) / np.linalg.norm(pg)
        assert along_pg < along_g * 0.5


class TestKwsOnRealLattices:
    """Index lattices produced by the real decoder and search keywords
    (kws-functions.h end-to-end shape)."""

    def test_index_and_search_decoded_lattices(self):
        import os
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_mono_e2e import FS, make_corpus, unigram_g
        from kaldi_tpu.decoder.graph import Lang
        from kaldi_tpu.decoder.lattice_decoder import (
            LatticeFasterDecoder, LatticeFasterDecoderOptions)
        from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
        from kaldi_tpu.feat.window import FrameExtractionOptions
        from kaldi_tpu.kws.index import KwsIndex
        from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                            train_mono)
        train_txt, train_wav, test_txt, test_wav = make_corpus(
            num_train=8, num_test=3)
        comp = OfflineFeature(MfccOptions(
            frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
        tf = dict(zip(train_wav,
                      comp.compute_batch(list(train_wav.values()))))
        sf = dict(zip(test_wav,
                      comp.compute_batch(list(test_wav.values()))))
        lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                    sil_prob=0.5)
        lang.make_topology()
        sys_ = train_mono(lang, tf, train_txt,
                          TrainMonoOptions(num_iters=5, totgauss=24,
                                           realign_iters=(1, 2, 3, 4)))
        hclg = make_hclg(sys_, unigram_g(lang))
        dec = LatticeFasterDecoder(hclg, LatticeFasterDecoderOptions(
            beam=16.0, lattice_beam=7.0, determinize_lattice=False))
        idx = KwsIndex()
        T_of = {}
        for utt, feats in sf.items():
            ll = np.asarray(sys_.am.log_likes_batch(feats))
            lat = dec.decode(ll, sys_.tm.id2pdf_id, 0.1)
            idx.add_lattice(utt, lat)
            T_of[utt] = ll.shape[0]
        yes, no = lang.words["YES"], lang.words["NO"]
        # single-word search: every utterance containing YES is found
        hits = idx.search([yes])
        found = {h.utt for h in hits if h.score > 0.5}
        expected = {u for u, ws in test_txt.items() if "YES" in ws}
        assert expected <= found
        for h in hits:
            assert 0 <= h.start_frame < h.end_frame <= T_of[h.utt]
        # multi-word: utterances with consecutive NO NO
        hits2 = idx.search([no, no], max_gap_frames=100)
        exp2 = {u for u, ws in test_txt.items()
                if any(a == b == "NO" for a, b in zip(ws, ws[1:]))}
        assert exp2 <= {h.utt for h in hits2 if h.score > 0.25}
        # absent word id -> no hits
        assert idx.search([9999]) == []
