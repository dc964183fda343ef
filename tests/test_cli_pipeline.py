"""Shell-workflow test: the train_mono.sh / decode.sh command sequence
driven through the actual CLI entry points (in-process for speed) —
gmm-init-mono .. compile-train-graphs .. align/acc/est iterations ..
gmm-latgen-faster .. lattice-best-path .. compute-wer."""

import os
import sys

import numpy as np
import pytest

from kaldi_tpu.cli import get_tool
from kaldi_tpu.decoder.graph import Lang, make_lexicon_fst
from kaldi_tpu.feat.wave import WaveData
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter

sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g


def run(tool, *args):
    rc = get_tool(tool)([tool] + [str(a) for a in args])
    assert rc == 0, f"{tool} failed with {rc}"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mono_cli")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=10, num_test=3)
    # wav.scp files
    for name, wavs in (("train", train_wav), ("test", test_wav)):
        scp = []
        for utt, wav in wavs.items():
            p = d / f"{utt}.wav"
            with open(p, "wb") as f:
                WaveData(FS, wav[None, :]).write(f)
            scp.append(f"{utt} {p}")
        (d / f"wav_{name}.scp").write_text("\n".join(scp) + "\n")
    # lang resources
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    topo = lang.make_topology()
    kaldi_io.write_kaldi_object(topo.write, str(d / "topo"), binary=False)
    L = make_lexicon_fst(lang, with_disambig=True)
    kaldi_io.write_kaldi_object(L.write, str(d / "L.fst"))
    # transcripts as word-ids
    with TableWriter("int-vector", f"ark:{d}/train_text.int") as w:
        for utt, words in train_txt.items():
            w.write(utt, lang.word_ids(words))
    # reference text for scoring
    with TableWriter("token-vector", f"ark:{d}/test_text") as w:
        for utt, words in test_txt.items():
            w.write(utt, words)
    g = unigram_g(lang)
    kaldi_io.write_kaldi_object(g.write, str(d / "G.fst"))
    return d, lang, test_txt


def test_full_cli_pipeline(workdir):
    d, lang, test_txt = workdir
    # features
    run("compute-mfcc-feats", f"--sample-frequency={FS}", "--dither=0",
        f"scp:{d}/wav_train.scp", f"ark,scp:{d}/train.ark,{d}/train.scp")
    run("compute-mfcc-feats", f"--sample-frequency={FS}", "--dither=0",
        f"scp:{d}/wav_test.scp", f"ark:{d}/test.ark")
    # init
    run("gmm-init-mono", f"--train-feats=ark:{d}/train.ark",
        f"{d}/topo", 13, f"{d}/0.mdl", f"{d}/tree")
    run("gmm-info", f"{d}/0.mdl")
    # graphs
    run("compile-train-graphs", "--self-loop-scale=0.1",
        f"{d}/tree", f"{d}/0.mdl", f"{d}/L.fst",
        f"ark:{d}/train_text.int", f"ark:{d}/graphs.ark")
    # iteration 0: equal align
    run("align-equal-compiled", f"ark:{d}/graphs.ark", f"ark:{d}/train.ark",
        f"ark:{d}/ali.0.ark")
    run("gmm-acc-stats-ali", f"{d}/0.mdl", f"ark:{d}/train.ark",
        f"ark:{d}/ali.0.ark", f"{d}/0.acc")
    run("gmm-est", "--min-gaussian-occupancy=3", "--mix-up=20",
        f"{d}/0.mdl", f"{d}/0.acc", f"{d}/1.mdl")
    # EM iterations
    mdl = "1.mdl"
    for it in range(1, 5):
        run("gmm-align-compiled", "--beam=10", "--acoustic-scale=0.1",
            f"{d}/{mdl}", f"ark:{d}/graphs.ark", f"ark:{d}/train.ark",
            f"ark:{d}/ali.{it}.ark")
        run("gmm-acc-stats-ali", f"{d}/{mdl}", f"ark:{d}/train.ark",
            f"ark:{d}/ali.{it}.ark", f"{d}/{it}.acc")
        nxt = f"{it + 1}.mdl"
        run("gmm-est", "--min-gaussian-occupancy=3", "--mix-up=30",
            f"{d}/{mdl}", f"{d}/{it}.acc", f"{d}/{nxt}")
        mdl = nxt
    # alignment sanity through ali-to-phones
    run("ali-to-phones", "--per-frame=true", f"{d}/{mdl}",
        f"ark:{d}/ali.4.ark", f"ark:{d}/phones.ark")
    # build HCLG in-process (mkgraph equivalent) and decode via CLI
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.fstext.fst import VectorFst
    from kaldi_tpu.recipes.mono import make_hclg
    from kaldi_tpu.tree import ContextDependency

    tm, am = read_am_gmm(str(d / mdl))
    tree = kaldi_io.read_kaldi_object(ContextDependency.read, str(d / "tree"))

    class _S:  # minimal MonoSystem shim for make_hclg
        pass
    s = _S()
    s.lang, s.tree, s.tm = lang, tree, tm
    g = kaldi_io.read_kaldi_object(VectorFst.read, str(d / "G.fst"))
    from kaldi_tpu.decoder.graph import make_decoding_graph
    hclg = make_decoding_graph(lang, g, tree, tm)
    kaldi_io.write_kaldi_object(hclg.write, str(d / "HCLG.fst"))

    run("gmm-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/{mdl}", f"{d}/HCLG.fst", f"ark:{d}/test.ark",
        f"ark:{d}/lat.ark", f"ark:{d}/words.ark")
    # lattice ops through CLIs
    run("lattice-scale", "--lm-scale=1.0", "--acoustic-scale=1.0",
        f"ark:{d}/lat.ark", f"ark:{d}/lat_scaled.ark")
    run("lattice-best-path", f"ark:{d}/lat_scaled.ark",
        f"ark:{d}/best_words.ark")
    run("lattice-to-nbest", "--n=3", f"ark:{d}/lat.ark",
        f"ark:{d}/nbest.ark")
    run("lattice-to-post", f"ark:{d}/lat.ark", f"ark:{d}/post.ark")
    # hypotheses to text + WER
    hyps = dict(SequentialTableReader("int-vector", f"ark:{d}/best_words.ark"))
    with TableWriter("token-vector", f"ark:{d}/hyp_text") as w:
        for utt, ids in hyps.items():
            w.write(utt, [lang.word_names[i] for i in ids])
    run("compute-wer", "--mode=present", f"ark:{d}/test_text",
        f"ark:{d}/hyp_text")
    # assert accuracy directly
    from kaldi_tpu.util.edit_distance import WerStats
    stats = WerStats()
    hyp_txt = dict(SequentialTableReader("token-vector", f"ark:{d}/hyp_text"))
    for utt, ref in test_txt.items():
        stats.add(ref, hyp_txt.get(utt, []))
    assert stats.wer <= 10.0, stats.report()


def test_online_cli_decode(workdir):
    d, lang, test_txt = workdir
    if not (d / "HCLG.fst").exists():
        pytest.skip("needs test_full_cli_pipeline artifacts")
    run("online2-wav-gmm-latgen-faster", f"--sample-frequency={FS}",
        "--dither=0", "--chunk-length=0.2", "--acoustic-scale=0.1",
        f"{d}/5.mdl", f"{d}/HCLG.fst", f"scp:{d}/wav_test.scp",
        f"ark:{d}/online_words.ark")
    got = dict(SequentialTableReader("int-vector",
                                     f"ark:{d}/online_words.ark"))
    assert len(got) == len(test_txt)
    from kaldi_tpu.util.edit_distance import WerStats
    stats = WerStats()
    for utt, ref in test_txt.items():
        hyp = [lang.word_names[w] for w in got.get(utt, [])]
        stats.add(ref, hyp)
    assert stats.wer <= 10.0, stats.report()


def test_posterior_tool_chain(tmp_path, mono_artifacts=None):
    """ali-to-post -> weight-silence-post -> post-to-weights on a tiny
    fabricated model+alignment."""
    import numpy as np
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.hmm import HmmTopology, TransitionModel
    from kaldi_tpu.tree import monophone_context_dependency
    from kaldi_tpu.util.table import SequentialTableReader, TableWriter
    phones = [1, 2]
    topo = HmmTopology.chain_topology(phones)
    npc = {p: topo.num_pdf_classes(p) for p in phones}
    tm = TransitionModel(topo, monophone_context_dependency(phones, npc))
    am = AmDiagGmm()
    for _ in range(tm.num_pdfs):
        g = DiagGmm(1, 2)
        g.set_from_means_and_vars([1.0], [[0.0, 0.0]], [[1.0, 1.0]])
        am.add_pdf(g)
    mdl = str(tmp_path / "m.mdl")
    write_am_gmm(mdl, tm, am)
    # alignment: phone 1 then phone 2 via fwd+self tids
    def tids(ph):
        for ts in range(1, tm.num_transition_states + 1):
            if tm.transition_state_to_phone(ts) == ph:
                fwd = next(tm.pair_to_transition_id(ts, i)
                           for i in range(tm.num_transition_indices(ts))
                           if not tm.is_self_loop(
                               tm.pair_to_transition_id(ts, i)))
                return fwd, tm.self_loop_of(ts)
    f1, s1 = tids(1)
    f2, s2 = tids(2)
    ali = [f1, s1, s1, f2, s2]
    with TableWriter("int-vector", f"ark:{tmp_path}/ali.ark") as w:
        w.write("u1", ali)
    assert get_tool("ali-to-post")([
        "ali-to-post", f"ark:{tmp_path}/ali.ark",
        f"ark:{tmp_path}/post.ark"]) == 0
    assert get_tool("weight-silence-post")([
        "weight-silence-post", "0.0", "1", mdl,
        f"ark:{tmp_path}/post.ark", f"ark:{tmp_path}/postw.ark"]) == 0
    assert get_tool("post-to-weights")([
        "post-to-weights", f"ark:{tmp_path}/postw.ark",
        f"ark:{tmp_path}/w.ark"]) == 0
    w = dict(SequentialTableReader("vector", f"ark:{tmp_path}/w.ark"))["u1"]
    # phone-1 frames zeroed (silence weight 0), phone-2 frames kept
    np.testing.assert_allclose(w, [0, 0, 0, 1, 1], atol=1e-6)


def test_ubm_cli_chain(tmp_path):
    """gmm-global-init-from-feats -> acc/est -> to-fgmm -> fgmm acc/est:
    the UBM training flow of the ivector recipes, via CLIs."""
    import numpy as np
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.util.table import TableWriter
    rng = np.random.default_rng(0)
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        for u in range(4):
            w.write(f"u{u}", rng.normal(size=(100, 6)).astype(np.float32)
                    + rng.integers(0, 3) * 2.0)

    def run(*args):
        assert get_tool(args[0])(list(map(str, args))) == 0

    run("gmm-global-init-from-feats", "--num-gauss=4", "--num-iters=2",
        f"ark:{tmp_path}/f.ark", f"{tmp_path}/d.gmm")
    run("gmm-global-acc-stats", f"{tmp_path}/d.gmm",
        f"ark:{tmp_path}/f.ark", f"{tmp_path}/d.acc")
    run("gmm-global-est", "--mix-up=6", f"{tmp_path}/d.gmm",
        f"{tmp_path}/d.acc", f"{tmp_path}/d2.gmm")
    run("gmm-global-to-fgmm", f"{tmp_path}/d2.gmm", f"{tmp_path}/u.fgmm")
    run("fgmm-global-acc-stats", f"{tmp_path}/u.fgmm",
        f"ark:{tmp_path}/f.ark", f"{tmp_path}/u.facc")
    run("fgmm-global-est", f"{tmp_path}/u.fgmm", f"{tmp_path}/u.facc",
        f"{tmp_path}/u2.fgmm")
    from kaldi_tpu.gmm.full_gmm import FullGmm
    from kaldi_tpu.util import kaldi_io
    fg = kaldi_io.read_kaldi_object(FullGmm.read, f"{tmp_path}/u2.fgmm")
    assert fg.num_gauss == 6
