"""Round-4 CLI tail batch 15: GrammarFst tooling, batched nnet3
compute, and the cudafeat/cudadecoder binary surface
(make-grammar-fst, nnet3-compute-batch, compute-*-feats-cuda,
apply-cmvn-online-cuda, compute-online-feats-cuda,
batched-wav-nnet3-cuda2, online2-wav-nnet3-latgen-grammar/
-incremental, nnet3-egs-augment-image)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def run(tool, *args):
    rc = get_tool(tool)([tool] + [str(a) for a in args])
    assert rc == 0, f"{tool} failed with {rc}"


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus, unigram_g

    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.wave import WaveData
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.nnet3.mdl_io import read_raw_nnet3, write_nnet3_am
    from kaldi_tpu.recipes.mono import TrainMonoOptions, make_hclg, train_mono
    d = tmp_path_factory.mktemp("tail15")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=2)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav,
                  comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=4, totgauss=24,
                                       realign_iters=(1, 2, 3)))
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, make_hclg(sys_, unigram_g(lang)))
    with open(f"{d}/words.txt", "w") as f:
        for w, i in sorted(lang.words.items(), key=lambda kv: kv[1]):
            f.write(f"{w} {i}\n")
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    # test wav.scp
    scp = []
    for utt, wav in sorted(test_wav.items()):
        p = d / f"{utt}.wav"
        with open(p, "wb") as f:
            WaveData(FS, wav[None, :]).write(f)
        scp.append(f"{utt} {p}")
    (d / "wav.scp").write_text("\n".join(scp) + "\n")
    # tiny nnet3 .mdl over the mono transition model (random affine
    # 13 -> num_pdfs, same construction as test_cli_online2)
    rng = np.random.default_rng(0)
    D, P = 13, sys_.tm.num_pdfs
    lin = rng.normal(scale=0.1, size=(P, D))
    rows = "\n".join(" ".join(f"{v:.5f}" for v in r) + " "
                     for r in lin)
    raw = (f"<Nnet3>\ninput-node name=input dim={D}\n"
           "component-node name=aff component=aff input=input\n"
           "output-node name=output input=aff objective=linear\n\n"
           "<NumComponents> 1\n"
           "<ComponentName> aff <NaturalGradientAffineComponent> "
           "<LearningRate> 0.001 <LinearParams>  [\n" + rows + "]\n"
           "<BiasParams>  [ " + " ".join("0" for _ in range(P)) +
           " ]\n<RankIn> 20 <RankOut> 80 <UpdatePeriod> 4 "
           "<NumSamplesHistory> 2000 <Alpha> 4 "
           "</NaturalGradientAffineComponent>\n</Nnet3>\n")
    (d / "a.raw").write_text(raw)
    g = read_raw_nnet3(str(d / "a.raw"))
    write_nnet3_am(f"{d}/am.mdl", sys_.tm, g)
    return dict(d=str(d), sys=sys_, tf=tf, sf=sf, lang=lang, fs=FS,
                test_txt=test_txt, test_wav=test_wav)


# ----------------------------------------------------------------------
# make-grammar-fst
# ----------------------------------------------------------------------

def test_make_grammar_fst_container_and_expand(tmp_path):
    from test_grammar_fst import (OFFSET, NT_X, all_paths, build_static,
                                  build_sub, build_top)

    from kaldi_tpu.cli.tail15_tools import read_grammar_any
    from kaldi_tpu.fstext.grammar_fst import GrammarFst
    from kaldi_tpu.fstext.openfst_io import read_fst_file, write_fst
    for name, fst in (("top", build_top()), ("sub", build_sub())):
        with open(tmp_path / f"{name}.fst", "wb") as f:
            write_fst(f, fst)
        # usage (2): prepare a single FST for grammar decoding
        run("make-grammar-fst", f"--nonterm-phones-offset={OFFSET}",
            tmp_path / f"{name}.fst", tmp_path / f"{name}_prep.fst")
    want = all_paths(build_static())
    # usage (1), grammar container
    run("make-grammar-fst", f"--nonterm-phones-offset={OFFSET}",
        tmp_path / "top_prep.fst", NT_X, tmp_path / "sub_prep.fst",
        tmp_path / "grammar.bin")
    g = read_grammar_any(str(tmp_path / "grammar.bin"))
    assert isinstance(g, GrammarFst)
    assert all_paths(g) == want
    # usage (1), statically expanded FST
    run("make-grammar-fst", f"--nonterm-phones-offset={OFFSET}",
        "--write-as-grammar=false",
        tmp_path / "top_prep.fst", NT_X, tmp_path / "sub_prep.fst",
        tmp_path / "expanded.fst")
    exp = read_fst_file(str(tmp_path / "expanded.fst"))
    assert all_paths(exp) == want
    # read_grammar_any on a plain FST falls through to read_fst_file
    plain = read_grammar_any(str(tmp_path / "expanded.fst"))
    assert not isinstance(plain, GrammarFst)
    assert all_paths(plain) == want


def test_online2_wav_nnet3_latgen_grammar(env, tmp_path):
    """Grammar decode == plain decode when the 'grammar' is the plain
    HCLG prepared by make-grammar-fst usage (2)."""
    d = env["d"]
    off = max(env["sys"].lang.phones.values()) + 1
    run("make-grammar-fst", f"--nonterm-phones-offset={off}",
        f"{d}/HCLG.fst", f"{tmp_path}/HCLG_prep.fst")
    common = [f"--sample-frequency={env['fs']}", "--dither=0.0",
              "--frame-subsampling-factor=1"]
    run("online2-wav-nnet3-latgen-grammar", *common,
        f"{d}/am.mdl", f"{tmp_path}/HCLG_prep.fst", f"scp:{d}/wav.scp",
        f"ark:{tmp_path}/words_g.ark")
    run("online2-wav-nnet3-latgen-faster", *common,
        f"{d}/am.mdl", f"{d}/HCLG.fst", f"scp:{d}/wav.scp",
        f"ark:{tmp_path}/words_f.ark")
    wg = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/words_g.ark"))
    wf = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/words_f.ark"))
    assert set(wg) == set(env["test_wav"])
    for u in wg:
        np.testing.assert_array_equal(wg[u], wf[u])


def test_online2_wav_nnet3_latgen_incremental(env, tmp_path):
    d = env["d"]
    run("online2-wav-nnet3-latgen-incremental",
        f"--sample-frequency={env['fs']}", "--dither=0.0",
        "--frame-subsampling-factor=1", "--determinize-period=10",
        f"{d}/am.mdl", f"{d}/HCLG.fst", f"scp:{d}/wav.scp",
        f"ark:{tmp_path}/lat.ark")
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    lats = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{tmp_path}/lat.ark"))
    assert set(lats) == set(env["test_wav"])
    from kaldi_tpu.lat.functions import lattice_best_path
    for lat in lats.values():
        _ali, words, _cost = lattice_best_path(lat)
        assert len(words) >= 1


# ----------------------------------------------------------------------
# batched nnet3 compute
# ----------------------------------------------------------------------

def test_nnet3_compute_batch_matches_single(env, tmp_path):
    d = env["d"]
    run("nnet3-compute", f"{d}/am.mdl",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/single.ark")
    run("nnet3-compute-batch", "--batch-size=3", f"{d}/am.mdl",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/batch.ark")
    single = dict(SequentialTableReader("matrix",
                                        f"ark:{tmp_path}/single.ark"))
    batch = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/batch.ark"))
    assert set(single) == set(batch) == set(env["tf"])
    for u in single:
        assert batch[u].shape == single[u].shape
        np.testing.assert_allclose(batch[u], single[u], rtol=1e-4,
                                   atol=1e-4)


def test_nnet3_egs_augment_image(tmp_path):
    from kaldi_tpu.nnet3.egs import ExampleHolder, NnetExample
    rng = np.random.default_rng(1)
    W, H = 8, 4
    m = rng.normal(size=(W, H)).astype(np.float32)
    eg = NnetExample(m, [[(0, 1.0)] for _ in range(W)])
    with TableWriter(ExampleHolder(), f"ark:{tmp_path}/egs.ark") as w:
        w.write("u1", eg)
    # flip probability 1 => rows reversed, deterministically
    run("nnet3-egs-augment-image", "--horizontal-flip-prob=1.0",
        f"ark:{tmp_path}/egs.ark", f"ark:{tmp_path}/flip.ark")
    out = dict(SequentialTableReader(ExampleHolder(),
                                     f"ark:{tmp_path}/flip.ark"))
    np.testing.assert_allclose(out["u1"].feats, m[::-1], rtol=1e-6)
    # vertical shift keeps shape and is a pure roll of the rows
    run("nnet3-egs-augment-image", "--vertical-shift=0.5",
        "--srand=3", f"ark:{tmp_path}/egs.ark",
        f"ark:{tmp_path}/vs.ark")
    out = dict(SequentialTableReader(ExampleHolder(),
                                     f"ark:{tmp_path}/vs.ark"))
    assert out["u1"].feats.shape == m.shape
    assert sorted(out["u1"].feats.ravel()) == \
        pytest.approx(sorted(m.ravel()))


# ----------------------------------------------------------------------
# cudafeat surface
# ----------------------------------------------------------------------

@pytest.mark.parametrize("cuda,plain,flag", [
    ("compute-mfcc-feats-cuda", "compute-mfcc-feats", "mfcc"),
    ("compute-fbank-feats-cuda", "compute-fbank-feats", "fbank"),
    ("compute-mfcc-online-batched-cuda", "compute-mfcc-feats", "mfcc"),
])
def test_batched_feats_cuda_match(env, tmp_path, cuda, plain, flag):
    d = env["d"]
    run(plain, f"--sample-frequency={env['fs']}", "--dither=0",
        f"scp:{d}/wav.scp", f"ark:{tmp_path}/ref.ark")
    run(cuda, f"--sample-frequency={env['fs']}", "--dither=0",
        "--batch-size=2", f"scp:{d}/wav.scp",
        f"ark:{tmp_path}/dev.ark")
    ref = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/ref.ark"))
    dev = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/dev.ark"))
    assert set(ref) == set(dev) == set(env["test_wav"])
    for u in ref:
        assert dev[u].shape == ref[u].shape
        np.testing.assert_allclose(dev[u], ref[u], rtol=1e-3, atol=2e-2)


def test_apply_cmvn_online_cuda_matches_host(env, tmp_path):
    d = env["d"]
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.feat.functions import acc_cmvn_stats
    stats = acc_cmvn_stats(np.concatenate(list(env["tf"].values())))
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, stats),
        f"{tmp_path}/global.mat")
    run("apply-cmvn-online", f"{tmp_path}/global.mat",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/host.ark")
    run("apply-cmvn-online-cuda", f"{tmp_path}/global.mat",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/dev.ark")
    host = dict(SequentialTableReader("matrix",
                                      f"ark:{tmp_path}/host.ark"))
    dev = dict(SequentialTableReader("matrix",
                                     f"ark:{tmp_path}/dev.ark"))
    assert set(host) == set(dev) == set(env["tf"])
    for u in host:
        np.testing.assert_allclose(dev[u], host[u], rtol=1e-4,
                                   atol=1e-4)


def test_compute_online_feats_cuda(env, tmp_path):
    """Full online front-end: MFCC + per-period batched device
    i-vectors from a tiny (random-init) extractor."""
    d = env["d"]
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.ivector.extractor import IvectorExtractor
    from kaldi_tpu.recipes.bench_corpus import save_ivector_extractor
    rng = np.random.default_rng(0)
    gmm = DiagGmm(4, 13)
    gmm.set_from_means_and_vars(
        np.full(4, 0.25), rng.normal(scale=3.0, size=(4, 13)),
        np.ones((4, 13)))
    ex = IvectorExtractor(gmm, 8)
    save_ivector_extractor(f"{tmp_path}/ivec.npz", ex)
    period = 10
    run("compute-online-feats-batched-cuda",
        f"--sample-frequency={env['fs']}", "--dither=0",
        f"--ivector-period={period}", f"{tmp_path}/ivec.npz",
        f"scp:{d}/wav.scp", f"ark:{tmp_path}/feats.ark",
        f"ark:{tmp_path}/ivecs.ark")
    feats = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/feats.ark"))
    ivecs = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/ivecs.ark"))
    assert set(feats) == set(ivecs) == set(env["test_wav"])
    for u in feats:
        T = feats[u].shape[0]
        assert ivecs[u].shape == (-(-T // period), 8)
        assert np.isfinite(ivecs[u]).all()
        # successive estimates refine, not reset: consecutive rows
        # should not be wildly different at the tail
        assert np.linalg.norm(ivecs[u][-1] - ivecs[u][-2]) < \
            np.linalg.norm(ivecs[u][0]) + 1.0


# ----------------------------------------------------------------------
# cudadecoder surface
# ----------------------------------------------------------------------

def test_batched_wav_nnet3_cuda2(env, tmp_path, capsys):
    d = env["d"]
    run("batched-wav-nnet3-cuda2", f"--sample-frequency={env['fs']}",
        "--dither=0.0", "--frame-subsampling-factor=1",
        "--max-batch-size=2", f"{d}/am.mdl", f"{d}/HCLG.fst",
        f"scp:{d}/wav.scp", f"ark:{tmp_path}/lat.ark")
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    lats = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{tmp_path}/lat.ark"))
    assert set(lats) == set(env["test_wav"])
    # the alias forwards to the same pipeline
    run("batched-wav-nnet3-cuda", f"--sample-frequency={env['fs']}",
        "--dither=0.0", "--frame-subsampling-factor=1",
        f"{d}/am.mdl", f"{d}/HCLG.fst", f"scp:{d}/wav.scp",
        f"ark:{tmp_path}/lat2.ark")
    lats2 = dict(SequentialTableReader(LatticeHolder(),
                                       f"ark:{tmp_path}/lat2.ark"))
    assert set(lats2) == set(lats)
    err = capsys.readouterr().err
    assert "RealTimeX" in err


def test_batched_wav_nnet3_cuda_online(env, tmp_path):
    d = env["d"]
    run("batched-wav-nnet3-cuda-online",
        f"--sample-frequency={env['fs']}",
        "--dither=0.0", "--frame-subsampling-factor=1",
        f"{d}/am.mdl", f"{d}/HCLG.fst", f"scp:{d}/wav.scp",
        f"ark:{tmp_path}/words.ark")
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words.ark"))
    assert set(words) == set(env["test_wav"])
