"""Round-3 CLI tail, batch 3: OpenFst-style fst tools and fst-archive
tools (parity: fstbin/{fstcopy,fstisstochastic,fstaddselfloops,
fstaddsubsequentialloop,fstrmsymbols,fstrmepslocal,fstdeterminizestar,
fstdeterminizelog,fstminimizeencoded,fsttablecompose,fstphicompose,
fstcomposecontext,fsts-concat,fsts-union,fsts-project,
fsts-to-transcripts,transcripts-to-fsts}.cc, lmbin/arpa2fst.cc,
bin/make-pdf-to-tid-transducer.cc)."""

from __future__ import annotations

import sys
from typing import List

from kaldi_tpu.base.logging import KaldiTpuError, log
from kaldi_tpu.fstext.fst import (Arc, LogWeight, TropicalWeight,
                                  VectorFst)
from kaldi_tpu.fstext.openfst_io import read_fst_file, write_fst
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def _write_fst_out(fst: VectorFst, wxfilename: str) -> None:
    from kaldi_tpu.util import kaldi_io
    with kaldi_io.output_stream(wxfilename) as f:
        write_fst(f, fst)


def _in_out(po, first: int = 1):
    fin = po.get_arg(first) if po.num_args() >= first else "-"
    fout = po.get_arg(first + 1) if po.num_args() >= first + 1 else "-"
    return fin, fout


def _read_int_list(rxfilename: str) -> List[int]:
    from kaldi_tpu.util import kaldi_io
    with kaldi_io.input_stream(rxfilename) as f:
        return [int(tok) for tok in f.read().decode("utf-8").split()]


def fstcopy(argv: List[str]) -> int:
    po = ParseOptions("Copy a single FST (binary or text input)\n"
                      "Usage: fstcopy [<fst-in> [<fst-out>]]")
    po.read(argv)
    if po.num_args() > 2:
        po.print_usage()
        return 1
    fin, fout = _in_out(po)
    _write_fst_out(read_fst_file(fin), fout)
    return 0


def fstisstochastic(argv: List[str]) -> int:
    po = ParseOptions(
        "Checks whether an FST is stochastic (every state's arc+final "
        "weights sum to One), prints the min/max deviation, and exits "
        "0 iff within --delta (fstbin/fstisstochastic.cc)\n"
        "Usage: fstisstochastic [<fst-in>]")
    delta = po.register_value("delta", 0.01, "Maximum error to accept.")
    test_in_log = po.register_value(
        "test-in-log", True, "Test stochasticity in log semiring.")
    po.read(argv)
    if po.num_args() > 1:
        po.print_usage()
        return 1
    fst = read_fst_file(po.get_arg(1) if po.num_args() >= 1 else "-")
    sr = LogWeight if bool(test_in_log[0]) else TropicalWeight
    mn, mx = 0.0, 0.0
    for s in range(fst.num_states):
        tot = sr.zero
        for a in fst.arcs[s]:
            tot = sr.plus(tot, float(a.weight))
        if fst.finals[s] != TropicalWeight.zero:
            tot = sr.plus(tot, float(fst.finals[s]))
        mn = min(mn, tot)
        mx = max(mx, tot)
    print(f"{mn:g} {mx:g}")
    d = float(delta[0])
    return 0 if (abs(mn) <= d and abs(mx) <= d) else 1


def fstaddselfloops(argv: List[str]) -> int:
    po = ParseOptions(
        "Adds self-loops to states of an FST to propagate "
        "disambiguation symbols through it.  They are added on each "
        "final state and each state with non-epsilon output symbols "
        "on at least one arc out of the state "
        "(fstext/pre-determinize-inl.h:601)\n"
        "Usage: fstaddselfloops <in-disambig-list> <out-disambig-list> "
        "[<in.fst> [<out.fst>]]")
    po.read(argv)
    if po.num_args() < 2 or po.num_args() > 4:
        po.print_usage()
        return 1
    isyms = _read_int_list(po.get_arg(1))
    osyms = _read_int_list(po.get_arg(2))
    if len(isyms) != len(osyms):
        raise KaldiTpuError("mismatch in size of disambiguation symbols")
    if any(x <= 0 for x in isyms + osyms):
        raise KaldiTpuError("disambiguation symbols must be > 0")
    fin, fout = _in_out(po, 3)
    fst = read_fst_file(fin)
    one = fst.semiring.one
    for s in range(fst.num_states):
        needs = fst.finals[s] != fst.semiring.zero
        if not needs:
            needs = any(a.olabel != 0 for a in fst.arcs[s])
        if needs:
            for i, o in zip(isyms, osyms):
                fst.add_arc(s, Arc(i, o, one, s))
    _write_fst_out(fst, fout)
    return 0


def fstaddsubsequentialloop(argv: List[str]) -> int:
    po = ParseOptions(
        "Adds a subsequential loop (a superfinal state with a "
        "self-loop on the given symbol, reached from every final "
        "state) to an FST — the C-composition trick of "
        "fstext/context-fst.cc:297\n"
        "Usage: fstaddsubsequentialloop <subseq-symbol> "
        "[<in.fst> [<out.fst>]]")
    po.read(argv)
    if po.num_args() < 1 or po.num_args() > 3:
        po.print_usage()
        return 1
    subseq = int(po.get_arg(1))
    fin, fout = _in_out(po, 2)
    fst = read_fst_file(fin)
    sr = fst.semiring
    finals = [s for s in range(fst.num_states)
              if fst.finals[s] != sr.zero]
    superfinal = fst.add_state()
    fst.add_arc(superfinal, Arc(subseq, 0, sr.one, superfinal))
    fst.set_final(superfinal, sr.one)
    for s in finals:
        fst.add_arc(s, Arc(subseq, 0, fst.finals[s], superfinal))
    _write_fst_out(fst, fout)
    return 0


def fstrmsymbols(argv: List[str]) -> int:
    po = ParseOptions(
        "With no options, replaces a subset of symbols with epsilon "
        "wherever they appear on the input side of an FST; "
        "--remove-arcs removes such arcs, --penalty adds a cost "
        "(fstbin/fstrmsymbols.cc)\n"
        "Usage: fstrmsymbols [options] <in-disambig-list> "
        "[<in.fst> [<out.fst>]]")
    apply_out = po.register_value(
        "apply-to-output", False,
        "If true, apply to the output, not the input, side")
    remove_arcs = po.register_value(
        "remove-arcs", False, "Remove arcs instead of relabeling")
    penalty = po.register_value(
        "penalty", 0.0, "Add this cost to arcs with a listed symbol "
        "instead of relabeling")
    po.read(argv)
    if po.num_args() < 1 or po.num_args() > 3:
        po.print_usage()
        return 1
    syms = set(_read_int_list(po.get_arg(1)))
    fin, fout = _in_out(po, 2)
    fst = read_fst_file(fin)
    out_side = bool(apply_out[0])

    def hit(a):
        return (a.olabel if out_side else a.ilabel) in syms

    if bool(remove_arcs[0]):
        for s in range(fst.num_states):
            fst.arcs[s] = [a for a in fst.arcs[s] if not hit(a)]
        from kaldi_tpu.fstext.ops import connect
        connect(fst)
    elif float(penalty[0]) != 0.0:
        pen = float(penalty[0])
        for s in range(fst.num_states):
            for a in fst.arcs[s]:
                if hit(a):
                    a.weight = fst.semiring.times(a.weight, pen)
    else:
        for s in range(fst.num_states):
            for a in fst.arcs[s]:
                if hit(a):
                    if out_side:
                        a.olabel = 0
                    else:
                        a.ilabel = 0
    _write_fst_out(fst, fout)
    return 0


def fstrmepslocal(argv: List[str]) -> int:
    po = ParseOptions(
        "Removes some (but not all) epsilons locally, in a way that "
        "preserves equivalence (fstbin/fstrmepslocal.cc)\n"
        "Usage: fstrmepslocal [<in.fst> [<out.fst>]]")
    po.read(argv)
    if po.num_args() > 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import remove_eps_local
    fin, fout = _in_out(po)
    _write_fst_out(remove_eps_local(read_fst_file(fin)), fout)
    return 0


def fstdeterminizestar(argv: List[str]) -> int:
    po = ParseOptions(
        "Removes epsilons and determinizes in one step "
        "(fstbin/fstdeterminizestar.cc)\n"
        "Usage: fstdeterminizestar [<in.fst> [<out.fst>]]")
    delta = po.register_value("delta", 1e-4,
                              "Delta value used to determine "
                              "equivalence of weights")
    max_states = po.register_value(
        "max-states", 0, "Maximum number of states (0 = no limit)")
    use_log = po.register_value(
        "use-log", False, "Determinize in log semiring")
    po.read(argv)
    if po.num_args() > 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import determinize_star
    fin, fout = _in_out(po)
    fst = read_fst_file(fin)
    if bool(use_log[0]):
        fst.semiring = LogWeight
    ms = int(max_states[0]) or 10_000_000
    out = determinize_star(fst, delta=float(delta[0]), max_states=ms)
    out.semiring = TropicalWeight
    _write_fst_out(out, fout)
    return 0


def fstdeterminizelog(argv: List[str]) -> int:
    po = ParseOptions(
        "Determinizes an FST in the log semiring "
        "(fstbin/fstdeterminizelog.cc)\n"
        "Usage: fstdeterminizelog [<in.fst> [<out.fst>]]")
    po.read(argv)
    if po.num_args() > 2:
        po.print_usage()
        return 1
    return fstdeterminizestar([argv[0], "--use-log=true"]
                              + argv[1:])


def fstminimizeencoded(argv: List[str]) -> int:
    po = ParseOptions(
        "Minimizes an FST after encoding (label, weight) pairs — "
        "applicable to non-deterministic FSTs "
        "(fstbin/fstminimizeencoded.cc)\n"
        "Usage: fstminimizeencoded [<in.fst> [<out.fst>]]")
    delta = po.register_value("delta", 1e-4,
                              "Delta likelihood for quantization")
    po.read(argv)
    if po.num_args() > 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import minimize_encoded
    fin, fout = _in_out(po)
    _write_fst_out(minimize_encoded(read_fst_file(fin),
                                    delta=float(delta[0])), fout)
    return 0


def fsttablecompose(argv: List[str]) -> int:
    po = ParseOptions(
        "Composes two FSTs (fstbin/fsttablecompose.cc; the table-"
        "matcher optimization is an implementation detail — the "
        "composition semantics are standard)\n"
        "Usage: fsttablecompose <fst1-in> <fst2-in> [<fst-out>]")
    connect_opt = po.register_value(
        "connect", True, "If true, trim the result")
    po.read(argv)
    if po.num_args() < 2 or po.num_args() > 3:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import compose, connect
    f1 = read_fst_file(po.get_arg(1))
    f2 = read_fst_file(po.get_arg(2))
    out = compose(f1, f2)
    if bool(connect_opt[0]):
        connect(out)
    _write_fst_out(out, po.get_arg(3) if po.num_args() >= 3 else "-")
    return 0


def _phi_compose(f1: VectorFst, f2: VectorFst, phi: int) -> VectorFst:
    """Composition treating label `phi` in fst2 as a failure
    transition: at each fst2 state, a label with no explicit match is
    looked up through the phi(-backoff) chain, accumulating the phi
    arcs' weights (OpenFst PhiMatcher semantics as used by
    fstbin/fstphicompose.cc for LM backoff composition)."""
    sr = f1.semiring
    out = VectorFst(sr)
    if f1.start < 0 or f2.start < 0:
        return out
    # index fst2: per state, label -> arc; phi arc separately
    tbl: List[dict] = []
    phi_arc: List = []
    for s in range(f2.num_states):
        d = {}
        pa = None
        for a in f2.arcs[s]:
            if a.ilabel == phi:
                pa = a
            else:
                d.setdefault(a.ilabel, a)
        tbl.append(d)
        phi_arc.append(pa)

    def match(s2: int, label: int):
        """Follow phi chain to match `label`; returns
        (accumulated weight, matched arc) or None."""
        w = sr.one
        seen = set()
        while True:
            a = tbl[s2].get(label)
            if a is not None:
                return w, a
            pa = phi_arc[s2]
            if pa is None or s2 in seen:
                return None
            seen.add(s2)
            w = sr.times(w, pa.weight)
            s2 = pa.nextstate

    def final2(s2: int):
        """Final weight of s2 through the phi chain."""
        w = sr.one
        seen = set()
        while True:
            if f2.finals[s2] != sr.zero:
                return sr.times(w, f2.finals[s2])
            pa = phi_arc[s2]
            if pa is None or s2 in seen:
                return sr.zero
            seen.add(s2)
            w = sr.times(w, pa.weight)
            s2 = pa.nextstate

    state_map = {}
    work = []

    def get(s1, s2):
        key = (s1, s2)
        if key not in state_map:
            state_map[key] = out.add_state()
            work.append(key)
        return state_map[key]

    out.set_start(get(f1.start, f2.start))
    while work:
        s1, s2 = work.pop()
        cur = state_map[(s1, s2)]
        if f1.finals[s1] != sr.zero:
            fw = final2(s2)
            if fw != sr.zero:
                out.set_final(cur, sr.times(f1.finals[s1], fw))
        for a in f1.arcs[s1]:
            if a.olabel == 0:
                out.add_arc(cur, Arc(a.ilabel, 0, a.weight,
                                     get(a.nextstate, s2)))
                continue
            m = match(s2, a.olabel)
            if m is None:
                continue
            w, a2 = m
            out.add_arc(cur, Arc(
                a.ilabel, a2.olabel, sr.times(a.weight,
                                              sr.times(w, a2.weight)),
                get(a.nextstate, a2.nextstate)))
    return out


def fstphicompose(argv: List[str]) -> int:
    po = ParseOptions(
        "Composes treating the given label in the second FST as a "
        "failure (phi/backoff) transition — used to compose with "
        "backoff LMs without adding extra paths "
        "(fstbin/fstphicompose.cc)\n"
        "Usage: fstphicompose <phi-label> <fst1-in> <fst2-in> "
        "[<fst-out>]")
    po.read(argv)
    if po.num_args() < 3 or po.num_args() > 4:
        po.print_usage()
        return 1
    phi = int(po.get_arg(1))
    f1 = read_fst_file(po.get_arg(2))
    f2 = read_fst_file(po.get_arg(3))
    from kaldi_tpu.fstext.ops import connect
    out = _phi_compose(f1, f2, phi)
    connect(out)
    _write_fst_out(out, po.get_arg(4) if po.num_args() >= 4 else "-")
    return 0


def fstcomposecontext(argv: List[str]) -> int:
    po = ParseOptions(
        "Composes an LG FST on the left with a dynamically-created "
        "context FST C, writing the ilabel-info of the result "
        "(fstbin/fstcomposecontext.cc, fstext/context-fst.h)\n"
        "Usage: fstcomposecontext <ilabels-output-file> "
        "[<in.fst> [<out.fst>]]")
    context_width = po.register_value("context-width", 3,
                                      "Size of phone context window")
    central_position = po.register_value(
        "central-position", 1,
        "Designated central position in context window")
    read_dis = po.register_value(
        "read-disambig-syms", "",
        "File with list of disambiguation symbols in the input")
    write_dis = po.register_value(
        "write-disambig-syms", "",
        "File to write the remapped disambiguation symbols")
    po.read(argv)
    if po.num_args() < 1 or po.num_args() > 3:
        po.print_usage()
        return 1
    from kaldi_tpu.base import io_funcs
    from kaldi_tpu.fstext.context import context_expand
    from kaldi_tpu.util import kaldi_io
    disambig = _read_int_list(read_dis[0]) if read_dis[0] else []
    fin, fout = _in_out(po, 2)
    lg = read_fst_file(fin)
    clg, ilabel_info = context_expand(
        lg, N=int(context_width[0]), P=int(central_position[0]),
        disambig_syms=disambig)
    # ilabel-info format (fstext/context-fst.cc WriteILabelInfo):
    # int32 count, then per entry an int32 vector
    with kaldi_io.output_stream(po.get_arg(1)) as f:
        io_funcs.init_output_stream(f, True)
        io_funcs.write_int32(f, True, len(ilabel_info))
        for entry in ilabel_info:
            io_funcs.write_int_vector(f, True, list(entry))
    if write_dis[0]:
        # disambig syms map to the ilabel-info entries (-sym,)
        with kaldi_io.output_stream(write_dis[0]) as f:
            for i, entry in enumerate(ilabel_info):
                if len(entry) == 1 and entry[0] < 0:
                    f.write(f"{i}\n".encode())
    _write_fst_out(clg, fout)
    return 0


def fsts_concat(argv: List[str]) -> int:
    po = ParseOptions(
        "Concatenate FSTs from two tables key by key "
        "(fstbin/fsts-concat.cc)\n"
        "Usage: fsts-concat <fsts-rspecifier1> <fsts-rspecifier2> "
        "<fsts-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.util.table import RandomAccessTableReader
    second = RandomAccessTableReader("fst", po.get_arg(2))
    n, miss = 0, 0
    with TableWriter("fst", po.get_arg(3)) as w:
        for key, f1 in SequentialTableReader("fst", po.get_arg(1)):
            if key not in second:
                miss += 1
                continue
            f2 = second[key]
            sr = f1.semiring
            off = f1.num_states
            for _ in range(f2.num_states):
                f1.add_state()
            for s in range(f2.num_states):
                for a in f2.arcs[s]:
                    f1.add_arc(off + s, Arc(a.ilabel, a.olabel,
                                            a.weight, off + a.nextstate))
                if f2.finals[s] != sr.zero:
                    f1.set_final(off + s, f2.finals[s])
            if f2.start >= 0:
                for s in range(off):
                    if f1.finals[s] != sr.zero:
                        f1.add_arc(s, Arc(0, 0, f1.finals[s],
                                          off + f2.start))
                        f1.set_final(s, sr.zero)
            w.write(key, f1)
            n += 1
    log(f"fsts-concat: {n} concatenated, {miss} missing in second table")
    return 0 if n else 1


def fsts_union(argv: List[str]) -> int:
    po = ParseOptions(
        "Union of FSTs from two tables key by key "
        "(fstbin/fsts-union.cc)\n"
        "Usage: fsts-union <fsts-rspecifier1> <fsts-rspecifier2> "
        "<fsts-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.util.table import RandomAccessTableReader
    second = RandomAccessTableReader("fst", po.get_arg(2))
    n = 0
    with TableWriter("fst", po.get_arg(3)) as w:
        for key, f1 in SequentialTableReader("fst", po.get_arg(1)):
            if key not in second:
                w.write(key, f1)
                n += 1
                continue
            f2 = second[key]
            sr = f1.semiring
            off = f1.num_states
            for _ in range(f2.num_states):
                f1.add_state()
            for s in range(f2.num_states):
                for a in f2.arcs[s]:
                    f1.add_arc(off + s, Arc(a.ilabel, a.olabel,
                                            a.weight, off + a.nextstate))
                if f2.finals[s] != sr.zero:
                    f1.set_final(off + s, f2.finals[s])
            if f1.start >= 0 and f2.start >= 0:
                ns = f1.add_state()
                f1.add_arc(ns, Arc(0, 0, sr.one, f1.start))
                f1.add_arc(ns, Arc(0, 0, sr.one, off + f2.start))
                f1.set_start(ns)
            w.write(key, f1)
            n += 1
    log(f"fsts-union: {n} written")
    return 0 if n else 1


def fsts_project(argv: List[str]) -> int:
    po = ParseOptions(
        "Project FSTs in a table onto input or output side "
        "(fstbin/fsts-project.cc)\n"
        "Usage: fsts-project <fsts-rspecifier> <fsts-wspecifier>")
    project_output = po.register_value(
        "project-output", False, "Project onto output (vs input) side")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import project
    n = 0
    with TableWriter("fst", po.get_arg(2)) as w:
        for key, f in SequentialTableReader("fst", po.get_arg(1)):
            w.write(key, project(f, bool(project_output[0])))
            n += 1
    log(f"fsts-project: {n} projected")
    return 0 if n else 1


def fsts_to_transcripts(argv: List[str]) -> int:
    po = ParseOptions(
        "Reads a table of FSTs; for each, finds the best path and "
        "prints the sequence of symbols (fstbin/fsts-to-transcripts.cc)"
        "\nUsage: fsts-to-transcripts <fsts-rspecifier> "
        "<transcriptions-wspecifier>")
    output_side = po.register_value(
        "output-side", True,
        "If true, get the symbols from the output side (olabels)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import shortest_path
    out_side = bool(output_side[0])
    n, fail = 0, 0
    with TableWriter("int-vector", po.get_arg(2)) as w:
        for key, f in SequentialTableReader("fst", po.get_arg(1)):
            sp = shortest_path(f)
            if sp.num_states == 0 or sp.start < 0:
                fail += 1
                continue
            labels = []
            s = sp.start
            while sp.arcs[s]:
                a = sp.arcs[s][0]
                lab = a.olabel if out_side else a.ilabel
                if lab != 0:
                    labels.append(lab)
                s = a.nextstate
            w.write(key, labels)
            n += 1
    log(f"fsts-to-transcripts: {n} done, {fail} with no path")
    return 0 if n else 1


def transcripts_to_fsts(argv: List[str]) -> int:
    po = ParseOptions(
        "Build a table of linear acceptor FSTs from integer "
        "transcripts (fstbin/transcripts-to-fsts.cc)\n"
        "Usage: transcripts-to-fsts <transcriptions-rspecifier> "
        "<fsts-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.graph import make_linear_word_acceptor
    n = 0
    with TableWriter("fst", po.get_arg(2)) as w:
        for key, words in SequentialTableReader("int-vector",
                                                po.get_arg(1)):
            w.write(key, make_linear_word_acceptor(words))
            n += 1
    log(f"transcripts-to-fsts: {n} done")
    return 0 if n else 1


def arpa2fst(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert an ARPA format language model into a word acceptor "
        "FST (lmbin/arpa2fst.cc)\n"
        "Usage: arpa2fst [options] <arpa-rxfilename> <fst-wxfilename>")
    disambig = po.register_value(
        "disambig-symbol", "",
        "Disambiguation symbol to put on backoff arcs (e.g. #0); "
        "empty means epsilon")
    symtab = po.register_value(
        "read-symbol-table", "", "Word symbol table (words.txt)")
    bos = po.register_value("bos-symbol", "<s>",
                            "Beginning of sentence symbol")
    eos = po.register_value("eos-symbol", "</s>",
                            "End of sentence symbol")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.lang_dir import read_symbol_table
    from kaldi_tpu.lm.arpa import arpa_to_fst, parse_arpa
    from kaldi_tpu.util import kaldi_io
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        lm = parse_arpa(f.read().decode("utf-8", errors="replace"))
    if symtab[0]:
        word_to_id = read_symbol_table(symtab[0])
    else:
        vocab = sorted({w for order in lm.ngrams for ng in order
                        for w in ng})
        word_to_id = {w: i + 1 for i, w in enumerate(vocab)}
    backoff_label = 0
    if disambig[0]:
        if disambig[0] not in word_to_id:
            raise KaldiTpuError(
                f"disambig symbol {disambig[0]!r} not in symbol table")
        backoff_label = word_to_id[disambig[0]]
    fst = arpa_to_fst(lm, word_to_id, bos=bos[0], eos=eos[0],
                      backoff_label=backoff_label)
    _write_fst_out(fst, po.get_arg(2))
    return 0


def make_pdf_to_tid_transducer(argv: List[str]) -> int:
    po = ParseOptions(
        "Make transducer from pdfs to transition-ids "
        "(bin/make-pdf-to-tid-transducer.cc)\n"
        "Usage: make-pdf-to-tid-transducer <model-filename> [<fst-out>]")
    po.read(argv)
    if po.num_args() < 1 or po.num_args() > 2:
        po.print_usage()
        return 1
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.util import kaldi_io
    tm = kaldi_io.read_kaldi_object(TransitionModel.read, po.get_arg(1))
    fst = VectorFst(TropicalWeight)
    s = fst.add_state()
    fst.set_start(s)
    fst.set_final(s, TropicalWeight.one)
    for tid in range(1, tm.num_transition_ids + 1):
        pdf = tm.transition_id_to_pdf(tid)
        fst.add_arc(s, Arc(pdf + 1, tid, TropicalWeight.one, s))
    _write_fst_out(fst, po.get_arg(2) if po.num_args() >= 2 else "-")
    return 0
