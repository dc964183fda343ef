"""Parallel job runner (parity: utils/run.pl — the `$cmd JOB=1:N log
command` contract that recipes use for embarrassingly-parallel array
jobs). Usage:

    python -m kaldi_tpu.util.run JOB=1:4 exp/log/align.JOB.log \\
        python -m kaldi_tpu.cli gmm-align-compiled ... ark:feats.JOB.ark ...

Each job substitutes JOB in args and the log path, runs locally (forked
processes), and the runner exits non-zero if any job fails — exactly
run.pl's behavior. (In this framework most parallelism happens as the
device batch dimension instead; this exists for recipe compatibility.)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple


def parse_job_spec(arg: str) -> Optional[Tuple[str, int, int]]:
    m = re.fullmatch(r"(\w+)=(\d+):(\d+)", arg)
    if m:
        return m.group(1), int(m.group(2)), int(m.group(3))
    return None


def run_jobs(argv: List[str], max_jobs_run: int = 0) -> int:
    i = 0
    job_name, lo, hi = "JOB", 1, 1
    have_spec = False
    spec = parse_job_spec(argv[0]) if argv else None
    if spec:
        job_name, lo, hi = spec
        have_spec = True
        i = 1
    if len(argv) < i + 2:
        print(__doc__, file=sys.stderr)
        return 1
    log_template = argv[i]
    command = argv[i + 1:]
    jobs = range(lo, hi + 1) if have_spec else [None]

    def one(job) -> int:
        sub = (lambda s: s.replace(job_name, str(job))) if job is not None \
            else (lambda s: s)
        log_path = sub(log_template)
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
        cmd = [sub(c) for c in command]
        with open(log_path, "w") as logf:
            logf.write("# " + " ".join(cmd) + "\n")
            logf.flush()
            rc = subprocess.run(cmd, stdout=logf,
                                stderr=subprocess.STDOUT).returncode
            logf.write(f"\n# Ended with status {rc}\n")
        return rc

    workers = max_jobs_run or len(list(jobs)) or 1
    with ThreadPoolExecutor(max_workers=workers) as ex:
        rcs = list(ex.map(one, jobs))
    failed = [j for j, rc in zip(jobs, rcs) if rc != 0]
    if failed:
        print(f"run.py: {len(failed)} / {len(rcs)} jobs failed "
              f"(e.g. {job_name}={failed[0]}; see "
              f"{log_template.replace(job_name, str(failed[0]))})",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(run_jobs(sys.argv[1:]))
