#!/usr/bin/env python
"""The yesno-equivalent demo recipe (parity: egs/yesno/s5/run.sh), end
to end on synthesized audio — the smallest full pipeline:

  stage 0: data prep (synthesize wavs, write wav.scp/text/utt2spk,
           lexicon -> lang directory)
  stage 1: MFCC features + CMVN stats
  stage 2: monophone GMM training (flat start + EM, via the CLIs)
  stage 3: HCLG graph build
  stage 4: decoding + scoring (WER)

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


if __name__ == "__main__":
    main()
