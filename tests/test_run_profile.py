"""run.pl-equivalent job runner + profiling utilities + tree CLIs."""

import os
import sys

import numpy as np
import pytest

from kaldi_tpu.util.run import parse_job_spec, run_jobs
from kaldi_tpu.util.profile import Timer, OnlineTimer, profile, _profile


def test_parse_job_spec():
    assert parse_job_spec("JOB=1:4") == ("JOB", 1, 4)
    assert parse_job_spec("nj=2:2") == ("nj", 2, 2)
    assert parse_job_spec("notaspec") is None


def test_run_jobs(tmp_path):
    rc = run_jobs([f"JOB=1:3", str(tmp_path / "log.JOB.txt"),
                   "python", "-c", "print('job JOB done')"])
    assert rc == 0
    for j in (1, 2, 3):
        content = (tmp_path / f"log.{j}.txt").read_text()
        assert f"job {j} done" in content


def test_run_jobs_failure(tmp_path):
    rc = run_jobs([f"JOB=1:2", str(tmp_path / "f.JOB.log"),
                   "python", "-c", "import sys; sys.exit(int('JOB') - 1)"])
    assert rc == 1  # job 2 exits 1


def test_profile():
    with profile("unit-test-span"):
        x = sum(range(1000))
    assert _profile["unit-test-span"] > 0
    t = Timer()
    assert t.elapsed() >= 0
    ot = OnlineTimer("utt")
    ot.compute_now(10.0)
    assert ot.real_time_factor() < 1.0


def test_tree_cli_pipeline(tmp_path):
    """acc-tree-stats -> sum -> cluster-phones -> build-tree via CLIs."""
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.util import kaldi_io
    from kaldi_tpu.util.table import TableWriter
    sys.path.insert(0, os.path.dirname(__file__))
    from test_hmm_gmm import mono_system
    from kaldi_tpu.gmm import AmDiagGmm, DiagGmm

    topo, tree0, tm = mono_system()
    rng = np.random.default_rng(0)
    am = AmDiagGmm()
    for _ in range(tree0.num_pdfs):
        g = DiagGmm(1, 6)
        g.set_from_means_and_vars([1.0], rng.normal(size=(1, 6)),
                                  np.ones((1, 6)))
        am.add_pdf(g)
    write_am_gmm(f"{tmp_path}/0.mdl", tm, am)
    kaldi_io.write_kaldi_object(topo.write, f"{tmp_path}/topo")
    # features + alignments
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as fw, \
            TableWriter("int-vector", f"ark:{tmp_path}/ali.ark") as aw:
        for i in range(3):
            T = 60
            fw.write(f"u{i}", rng.normal(size=(T, 6)).astype(np.float32))
            tids = []
            while len(tids) < T:
                ts = int(rng.integers(1, tm.num_transition_states + 1))
                tids.extend([tm.self_loop_of(ts)] * 4)
            aw.write(f"u{i}", tids[:T])

    def run(tool, *args):
        assert get_tool(tool)([tool] + [str(a) for a in args]) == 0

    run("acc-tree-stats", "--ci-phones=1", f"{tmp_path}/0.mdl",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/ali.ark",
        f"{tmp_path}/tree.acc")
    run("sum-tree-stats", f"{tmp_path}/tree_sum.acc", f"{tmp_path}/tree.acc")
    (tmp_path / "phones.list").write_text("2 3\n")
    run("cluster-phones", f"{tmp_path}/tree_sum.acc",
        f"{tmp_path}/phones.list", f"{tmp_path}/questions.txt")
    roots = tmp_path / "roots.txt"
    roots.write_text("shared split 2\nshared split 3\nshared not-split 1\n")
    run("build-tree", "--max-leaves=20", "--thresh=10",
        f"{tmp_path}/tree_sum.acc", str(roots),
        f"{tmp_path}/questions.txt", f"{tmp_path}/topo",
        f"{tmp_path}/tree")
    from kaldi_tpu.tree import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      f"{tmp_path}/tree")
    assert tree.context_width() == 3 and tree.num_pdfs >= 3
