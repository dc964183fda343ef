#!/usr/bin/env python
"""The yesno-equivalent demo recipe (parity: egs/yesno/s5/run.sh), end
to end on synthesized audio — the smallest full pipeline:

  stage 0: data prep (synthesize wavs, write wav.scp/text/utt2spk,
           lexicon -> lang directory)
  stage 1: MFCC features + CMVN stats
  stage 2: monophone GMM training (flat start + EM, via the CLIs)
  stage 3: HCLG graph build
  stage 4: decoding + scoring (WER)
  stage 5: chain TDNN-F training (GMM alignments -> LF-MMI with
           time-tolerant supervision; the trained net is EXPORTED in
           the reference's nnet3 .mdl format)
  stage 6: chain decode through the CLIs (nnet3-compute on the
           exported .mdl -> latgen-faster-mapped -> compute-wer)
  stage 7: ONLINE streaming decode of the exported chain .mdl
           (online2-wav-nnet3-latgen-faster) + scoring

Run:  python egs/synthetic/run.py [--stage N] [--dir exp_dir]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from kaldi_tpu.cli import get_tool  # noqa: E402
from kaldi_tpu.util.table import SequentialTableReader, TableWriter  # noqa: E402


def sh(tool, *args):
    rc = get_tool(tool)([tool] + [str(a) for a in args])
    if rc != 0:
        raise SystemExit(f"{tool} failed with status {rc}")


def synth_corpus(d, fs=8000.0):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_mono_e2e import make_corpus
    from kaldi_tpu.feat.wave import WaveData
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=12, num_test=4)
    for split, wavs, txt in (("train", train_wav, train_txt),
                             ("test", test_wav, test_txt)):
        sd = os.path.join(d, "data", split)
        os.makedirs(sd, exist_ok=True)
        with open(os.path.join(sd, "wav.scp"), "w") as scp, \
                open(os.path.join(sd, "text"), "w") as text, \
                open(os.path.join(sd, "utt2spk"), "w") as u2s:
            for utt, wav in sorted(wavs.items()):
                p = os.path.join(sd, f"{utt}.wav")
                with open(p, "wb") as f:
                    WaveData(fs, wav[None, :]).write(f)
                scp.write(f"{utt} {p}\n")
                text.write(f"{utt} {' '.join(txt[utt])}\n")
                u2s.write(f"{utt} global\n")
    with open(os.path.join(d, "data", "lexicon.txt"), "w") as f:
        f.write("YES Y\nNO N\n")
    return train_txt, test_txt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--dir", default="/tmp/kaldi_tpu_synthetic")
    args = ap.parse_args()
    d = args.dir
    os.makedirs(d, exist_ok=True)
    fs = 8000.0

    if args.stage <= 0:
        print("=== stage 0: data prep ===")
        synth_corpus(d, fs)
        from kaldi_tpu.decoder.lang_dir import prepare_lang
        prepare_lang(os.path.join(d, "data", "lexicon.txt"),
                     os.path.join(d, "lang"), sil_phone="SIL")

    if args.stage <= 1:
        print("=== stage 1: features ===")
        for split in ("train", "test"):
            sd = os.path.join(d, "data", split)
            sh("compute-mfcc-feats", f"--sample-frequency={fs}",
               "--dither=0", f"scp:{sd}/wav.scp",
               f"ark,scp:{sd}/feats.ark,{sd}/feats.scp")
            sh("compute-cmvn-stats", f"ark:{sd}/feats.ark",
               f"ark:{sd}/cmvn.ark")

    if args.stage <= 2:
        print("=== stage 2: mono training ===")
        exp = os.path.join(d, "exp", "mono")
        os.makedirs(exp, exist_ok=True)
        td = os.path.join(d, "data", "train")
        lang = os.path.join(d, "lang")
        # transcripts -> int
        from kaldi_tpu.decoder.lang_dir import read_symbol_table
        words = read_symbol_table(os.path.join(lang, "words.txt"))
        with open(os.path.join(td, "text")) as f, \
                TableWriter("int-vector", f"ark:{td}/text.int") as w:
            for line in f:
                parts = line.split()
                w.write(parts[0], [words[t] for t in parts[1:]])
        sh("gmm-init-mono", f"--train-feats=ark:{td}/feats.ark",
           f"{lang}/topo", 13, f"{exp}/0.mdl", f"{exp}/tree")
        sh("compile-train-graphs", "--self-loop-scale=0.1",
           f"{exp}/tree", f"{exp}/0.mdl", f"{lang}/L_disambig.fst",
           f"ark:{td}/text.int", f"ark:{exp}/graphs.ark")
        sh("align-equal-compiled", f"ark:{exp}/graphs.ark",
           f"ark:{td}/feats.ark", f"ark:{exp}/ali.ark")
        sh("gmm-acc-stats-ali", f"{exp}/0.mdl", f"ark:{td}/feats.ark",
           f"ark:{exp}/ali.ark", f"{exp}/0.acc")
        sh("gmm-est", "--min-gaussian-occupancy=3", "--mix-up=20",
           f"{exp}/0.mdl", f"{exp}/0.acc", f"{exp}/1.mdl")
        mdl = "1.mdl"
        for it in range(1, 6):
            sh("gmm-align-compiled", "--beam=10", "--acoustic-scale=0.1",
               f"{exp}/{mdl}", f"ark:{exp}/graphs.ark",
               f"ark:{td}/feats.ark", f"ark:{exp}/ali.ark")
            sh("gmm-acc-stats-ali", f"{exp}/{mdl}", f"ark:{td}/feats.ark",
               f"ark:{exp}/ali.ark", f"{exp}/{it}.acc")
            sh("gmm-est", "--min-gaussian-occupancy=3", "--mix-up=30",
               f"{exp}/{mdl}", f"{exp}/{it}.acc", f"{exp}/{it + 1}.mdl")
            mdl = f"{it + 1}.mdl"
        os.replace(os.path.join(exp, mdl), os.path.join(exp, "final.mdl"))
        sh("gmm-info", f"{exp}/final.mdl")

    if args.stage <= 3:
        print("=== stage 3: graph ===")
        # mkgraph: unigram G over the two words
        from kaldi_tpu.decoder.lang_dir import read_symbol_table
        from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
        from kaldi_tpu.fstext.openfst_io import write_fst
        lang = os.path.join(d, "lang")
        words = read_symbol_table(os.path.join(lang, "words.txt"))
        g = VectorFst(TropicalWeight)
        s = g.add_state()
        g.set_start(s)
        g.set_final(s)
        for wname in ("YES", "NO"):
            g.add_arc(s, Arc(words[wname], words[wname],
                             float(np.log(2.0)), s))
        with open(os.path.join(lang, "G.fst"), "wb") as f:
            write_fst(f, g)
        # build HCLG
        from kaldi_tpu.cli.gmm_tools import read_am_gmm
        from kaldi_tpu.decoder.graph import Lang as LangObj, \
            make_decoding_graph
        from kaldi_tpu.fstext.openfst_io import read_fst_file
        from kaldi_tpu.tree import ContextDependency
        from kaldi_tpu.util import kaldi_io
        exp = os.path.join(d, "exp", "mono")
        tm, am = read_am_gmm(f"{exp}/final.mdl")
        tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                          f"{exp}/tree")
        lang_obj = LangObj({"YES": [["Y"]], "NO": [["N"]]},
                           sil_phone="SIL", sil_prob=0.5)
        lang_obj.topo = tm.topo
        gfst = read_fst_file(os.path.join(lang, "G.fst"))
        hclg = make_decoding_graph(lang_obj, gfst, tree, tm)
        with open(os.path.join(exp, "HCLG.fst"), "wb") as f:
            write_fst(f, hclg)

    if args.stage <= 4:
        print("=== stage 4: decode + score ===")
        exp = os.path.join(d, "exp", "mono")
        sd = os.path.join(d, "data", "test")
        lang = os.path.join(d, "lang")
        sh("gmm-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
           f"{exp}/final.mdl", f"{exp}/HCLG.fst", f"ark:{sd}/feats.ark",
           f"ark:{exp}/lat.ark", f"ark:{exp}/words.ark")
        from kaldi_tpu.decoder.lang_dir import read_symbol_table
        words = read_symbol_table(os.path.join(lang, "words.txt"))
        names = {i: w for w, i in words.items()}
        hyps = dict(SequentialTableReader("int-vector",
                                          f"ark:{exp}/words.ark"))
        with TableWriter("token-vector", f"ark:{exp}/hyp.txt") as w:
            for utt, ids in hyps.items():
                w.write(utt, [names[i] for i in ids])
        sh("compute-wer", "--mode=present", f"ark:{sd}/text",
           f"ark:{exp}/hyp.txt")

    if args.stage <= 5:
        print("=== stage 5: chain TDNN-F training ===")
        from kaldi_tpu.cli.gmm_tools import read_am_gmm
        from kaldi_tpu.decoder.graph import (Lang as LangObj,
                                             TrainingGraphCompiler,
                                             make_decoding_graph)
        from kaldi_tpu.fstext.openfst_io import read_fst_file, write_fst
        from kaldi_tpu.nnet3.mdl_io import (chain_tdnnf_to_nnet3,
                                            write_nnet3_am)
        from kaldi_tpu.nnet3.models import ChainTdnnfConfig
        from kaldi_tpu.recipes.chain import (ChainTrainOptions,
                                             train_chain_topo)
        from kaldi_tpu.recipes.mono import MonoSystem, _align_all
        from kaldi_tpu.tree import ContextDependency
        from kaldi_tpu.util import kaldi_io as kio
        exp = os.path.join(d, "exp", "mono")
        chain_dir = os.path.join(d, "exp", "chain")
        os.makedirs(chain_dir, exist_ok=True)
        td = os.path.join(d, "data", "train")
        tm, am = read_am_gmm(f"{exp}/final.mdl")
        tree = kio.read_kaldi_object(ContextDependency.read, f"{exp}/tree")
        lang_obj = LangObj({"YES": [["Y"]], "NO": [["N"]]},
                           sil_phone="SIL", sil_prob=0.5)
        lang_obj.topo = tm.topo
        gmm_sys = MonoSystem(lang_obj, tree, tm, am)
        feats = dict(SequentialTableReader("matrix", f"ark:{td}/feats.ark"))
        texts = {}
        with open(os.path.join(td, "text")) as f:
            for line in f:
                parts = line.split()
                texts[parts[0]] = parts[1:]
        compiler = TrainingGraphCompiler(tm, tree, lang_obj)
        graphs = {u: compiler.compile(texts[u]) for u in feats}
        ali = _align_all(gmm_sys, graphs, feats, 10.0, 0.1, 1.0)
        cfg = ChainTdnnfConfig(feat_dim=13, num_pdfs=2 * len(lang_obj.phones),
                               hidden_dim=64, bottleneck_dim=16,
                               prefinal_dim=32, num_layers=4,
                               subsample_layer=2,
                               frame_subsampling_factor=3)
        opts = ChainTrainOptions(num_epochs=10, learning_rate=2e-3,
                                 minibatch_size=4, chunk_width=60,
                                 left_tolerance=5, right_tolerance=5)
        model, variables, den, chain_tm, chain_tree = train_chain_topo(
            gmm_sys, feats, ali, cfg, opts)
        # export the trained net in the reference's .mdl format
        graph_nn = chain_tdnnf_to_nnet3(model, variables)
        write_nnet3_am(os.path.join(chain_dir, "final.mdl"), chain_tm,
                       graph_nn, left_context=9, right_context=9)
        lang_obj.topo = chain_tm.topo
        gfst = read_fst_file(os.path.join(d, "lang", "G.fst"))
        hclg = make_decoding_graph(lang_obj, gfst, chain_tree, chain_tm,
                                   transition_scale=1.0,
                                   self_loop_scale=1.0)
        with open(os.path.join(chain_dir, "HCLG.fst"), "wb") as f:
            write_fst(f, hclg)

    if args.stage <= 6:
        print("=== stage 6: chain decode + score ===")
        chain_dir = os.path.join(d, "exp", "chain")
        sd = os.path.join(d, "data", "test")
        lang = os.path.join(d, "lang")
        # subsample features are handled inside the net; nnet3-compute
        # emits output-rate scores directly from the exported .mdl
        sh("nnet3-compute", f"{chain_dir}/final.mdl",
           f"ark:{sd}/feats.ark", f"ark:{chain_dir}/scores_full.ark")
        # chain outputs are at 1/3 frame rate: keep every 3rd row
        from kaldi_tpu.util.table import (SequentialTableReader as SR,
                                          TableWriter as TW)
        with TW("matrix", f"ark:{chain_dir}/scores.ark") as w:
            for utt, m in SR("matrix", f"ark:{chain_dir}/scores_full.ark"):
                w.write(utt, m[::3])
        sh("latgen-faster-mapped", "--acoustic-scale=1.0", "--beam=14",
           "--lattice-beam=4", "--max-active=2000",
           f"{chain_dir}/final.mdl", f"{chain_dir}/HCLG.fst",
           f"ark:{chain_dir}/scores.ark", f"ark:{chain_dir}/lat.ark",
           f"ark:{chain_dir}/words.ark")
        # scoring sweep over lm-scale x word-insertion-penalty on the
        # LATTICES (steps/scoring/score_kaldi.sh pattern)
        from kaldi_tpu.decoder.lang_dir import read_symbol_table
        from kaldi_tpu.lat.functions import (add_word_ins_penalty,
                                             lattice_best_path,
                                             lattice_scale)
        from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
        from kaldi_tpu.util.edit_distance import WerStats
        words = read_symbol_table(os.path.join(lang, "words.txt"))
        names = {i: w for w, i in words.items()}
        refs = {}
        with open(os.path.join(sd, "text")) as f:
            for line in f:
                parts = line.split()
                refs[parts[0]] = parts[1:]
        lats = dict(SequentialTableReader(LatticeHolder,
                                          f"ark:{chain_dir}/lat.ark"))
        best = None
        best_hyps = None
        for lm_scale in (0.5, 1.0, 1.5):
            for wip in (0.0, 0.5, 1.0, 2.0):
                stats = WerStats()
                hyps = {}
                for utt, lat in lats.items():
                    scaled = lattice_scale(lat, lm_scale=lm_scale)
                    scaled = add_word_ins_penalty(scaled, wip)
                    _, wids, _ = lattice_best_path(scaled)
                    hyps[utt] = [names[i] for i in wids]
                    stats.add(refs[utt], hyps[utt])
                if best is None or stats.wer < best[0].wer:
                    best = (stats, lm_scale, wip)
                    best_hyps = hyps
        stats, lm_scale, wip = best
        print(f"best scoring: lm-scale {lm_scale} penalty {wip}")
        with TableWriter("token-vector", f"ark:{chain_dir}/hyp.txt") as w:
            for utt, toks in best_hyps.items():
                w.write(utt, toks)
        sh("compute-wer", "--mode=present", f"ark:{sd}/text",
           f"ark:{chain_dir}/hyp.txt")

    if args.stage <= 7:
        print("=== stage 7: online streaming chain decode ===")
        chain_dir = os.path.join(d, "exp", "chain")
        sd = os.path.join(d, "data", "test")
        lang = os.path.join(d, "lang")
        sh("online2-wav-nnet3-latgen-faster",
           f"--sample-frequency={fs}", "--dither=0",
           "--acoustic-scale=1.0", "--frame-subsampling-factor=3",
           "--beam=14", "--word-ins-penalty=2.0",
           f"{chain_dir}/final.mdl", f"{chain_dir}/HCLG.fst",
           f"scp:{sd}/wav.scp", f"ark:{chain_dir}/online_words.ark")
        from kaldi_tpu.decoder.lang_dir import read_symbol_table
        words = read_symbol_table(os.path.join(lang, "words.txt"))
        names = {i: w for w, i in words.items()}
        hyps = dict(SequentialTableReader(
            "int-vector", f"ark:{chain_dir}/online_words.ark"))
        with TableWriter("token-vector",
                         f"ark:{chain_dir}/online_hyp.txt") as w:
            for utt, ids in hyps.items():
                w.write(utt, [names[i] for i in ids])
        sh("compute-wer", "--mode=present", f"ark:{sd}/text",
           f"ark:{chain_dir}/online_hyp.txt")


if __name__ == "__main__":
    main()
