"""Tree/context-FST tail: compile-questions + two-level tree,
biphone init, explicit C construction, context symbols, ilabel
merging transducer, lexicon-free graph compilation."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    """Mono system + tree stats on the synthetic corpus."""
    from test_mono_e2e import FS, make_corpus
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        train_mono)
    d = tmp_path_factory.mktemp("tree2")
    train_txt, train_wav, _t, _w = make_corpus(num_train=8, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=3, totgauss=18,
                                       realign_iters=(1, 2)))
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    ali = _align_all(sys_, graphs, tf, 10.0, 0.1, 1.0)
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    kaldi_io.write_kaldi_object(sys_.tm.topo.write, f"{d}/topo")
    kaldi_io.write_kaldi_object(sys_.tree.write, f"{d}/tree")
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    with TableWriter("int-vector", f"ark:{d}/ali.ark") as w:
        for u in sorted(ali):
            w.write(u, np.asarray(ali[u], np.int32))
    # triphone tree stats
    assert get_tool("acc-tree-stats")([
        "acc-tree-stats", "--context-width=3", "--central-position=1",
        f"{d}/final.mdl", f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
        f"{d}/treeacc"]) == 0
    phones = sorted(lang.phones.values())
    with open(f"{d}/phone_sets.txt", "w") as f:
        for p in phones:
            f.write(f"{p}\n")
    with open(f"{d}/roots.txt", "w") as f:
        for p in phones:
            f.write(f"{p} shared split\n")
    with open(f"{d}/phones.txt", "w") as f:
        f.write("<eps> 0\n")
        for name, pid in sorted(lang.phones.items(), key=lambda kv: kv[1]):
            f.write(f"{name} {pid}\n")
    return dict(d=str(d), sys=sys_, lang=lang, phones=phones)


def test_compile_questions_and_two_level(env, tmp_path):
    d = env["d"]
    assert get_tool("cluster-phones")([
        "cluster-phones", f"{d}/treeacc", f"{d}/phone_sets.txt",
        f"{tmp_path}/questions.txt"]) == 0
    assert get_tool("compile-questions")([
        "compile-questions", f"{d}/topo",
        f"{tmp_path}/questions.txt", f"{tmp_path}/questions.qst"]) == 0
    from kaldi_tpu.cli.tree2_tools import read_questions
    N, P, qs = read_questions(f"{tmp_path}/questions.qst")
    assert N == 3 and P == 1 and qs[0]
    assert get_tool("build-tree-two-level")([
        "build-tree-two-level", "--max-leaves-first=4",
        "--max-leaves-second=12", f"{d}/treeacc", f"{d}/roots.txt",
        f"{tmp_path}/questions.qst", f"{d}/topo",
        f"{tmp_path}/tree", f"{tmp_path}/tree.map"]) == 0
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.tree.context_dep import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      f"{tmp_path}/tree")
    mapping = kaldi_io.read_kaldi_object(iof.read_int_vector,
                                         f"{tmp_path}/tree.map")
    assert len(mapping) == tree.num_pdfs
    assert 1 <= len(set(mapping)) <= 4
    assert max(mapping) <= 3


def test_gmm_init_biphone(env, tmp_path):
    d = env["d"]
    assert get_tool("gmm-init-biphone")([
        "gmm-init-biphone", f"{d}/topo", "13",
        f"{tmp_path}/bi.mdl", f"{tmp_path}/bi.tree"]) == 0
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.tree.context_dep import ContextDependency
    tm, am = read_am_gmm(f"{tmp_path}/bi.mdl")
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      f"{tmp_path}/bi.tree")
    assert tree.context_width() == 2 and tree.central_position() == 1
    assert am.num_pdfs == tree.num_pdfs
    assert am.dim == 13
    # every (left, center) pair resolves to a leaf; different left
    # contexts give different leaves
    phones = env["phones"]
    p = phones[0]
    leaves = {tree.compute([lc, p], 0) for lc in [0] + phones}
    assert None not in leaves
    assert len(leaves) == len(phones) + 1


def test_context_fst_tools(env, tmp_path):
    d = env["d"]
    phones = env["phones"]
    subseq = max(phones) + 1
    assert get_tool("fstmakecontextfst")([
        "fstmakecontextfst", f"{d}/phones.txt", str(subseq),
        f"{tmp_path}/ilabels", f"{tmp_path}/C.fst"]) == 0
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    C = read_fst_file(f"{tmp_path}/C.fst")
    assert C.num_states >= 1
    # context syms name each window
    assert get_tool("fstmakecontextsyms")([
        "fstmakecontextsyms", f"{d}/phones.txt", f"{tmp_path}/ilabels",
        f"{tmp_path}/csyms.txt"]) == 0
    lines = open(f"{tmp_path}/csyms.txt").read().splitlines()
    assert lines[0].split()[0] == "<eps>"
    assert any("/" in ln.split()[0] for ln in lines[1:])
    # ilabel transducer: a MONOPHONE tree collapses all windows of
    # the same center phone
    assert get_tool("make-ilabel-transducer")([
        "make-ilabel-transducer",
        f"--old-to-new-mapping={tmp_path}/old2new",
        f"{tmp_path}/ilabels", f"{d}/tree", f"{d}/final.mdl",
        f"{tmp_path}/new_ilabels", f"{tmp_path}/map.fst"]) == 0
    from kaldi_tpu.base import io_funcs as iof
    with kaldi_io.input_stream(f"{tmp_path}/new_ilabels") as f:
        b = iof.init_input_stream(f)
        n_new = iof.read_int32(f, b)
        _ = [iof.read_int_vector(f, b) for _ in range(n_new)]
    with kaldi_io.input_stream(f"{tmp_path}/ilabels") as f:
        b = iof.init_input_stream(f)
        n_old = iof.read_int32(f, b)
    assert n_new < n_old
    # ≥ one new label per phone (+eps etc.)
    assert n_new >= len(phones)


def test_graphs_without_lexicon(env, tmp_path):
    d = env["d"]
    sys_ = env["sys"]
    lang = env["lang"]
    # phone transcripts from the word lexicon: Y SIL N ...
    with TableWriter("int-vector", f"ark:{tmp_path}/phones.ark") as w:
        w.write("u0", np.asarray(
            [lang.phones["SIL"], lang.phones["Y"],
             lang.phones["SIL"]], np.int32))
    assert get_tool("compile-train-graphs-without-lexicon")([
        "compile-train-graphs-without-lexicon",
        "--self-loop-scale=0.1", f"{d}/tree", f"{d}/final.mdl",
        f"ark:{tmp_path}/phones.ark", f"ark:{tmp_path}/g.ark"]) == 0
    graphs = dict(SequentialTableReader("fst",
                                        f"ark:{tmp_path}/g.ark"))
    g = graphs["u0"]
    assert g.num_states > 3
    # aligning real features through the graph yields the intended
    # phone sequence
    u = sorted(env["sys"].am.densities and ["u"])  # noqa: F841
    feats = list(SequentialTableReader("matrix", f"ark:{d}/feats.ark"))
    key, f0 = feats[0]
    ll = sys_.am.log_likes_batch(f0)
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    res = FasterDecoder(g, FasterDecoderOptions(beam=200)).decode(
        np.asarray(ll), sys_.tm.id2pdf_id, 0.1)
    assert res is not None
    ali, _words, _cost = res
    seq = []
    for tid in ali:
        ph = sys_.tm.transition_id_to_phone(tid)
        if not seq or seq[-1] != ph:
            if (sys_.tm.transition_id_to_hmm_state(tid) == 0
                    and not sys_.tm.is_self_loop(tid)) or not seq:
                seq.append(ph)
    assert seq == [lang.phones["SIL"], lang.phones["Y"],
                   lang.phones["SIL"]]
