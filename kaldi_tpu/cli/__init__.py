"""Kaldi-compatible command-line tools.

Each tool mirrors a reference binary (SURVEY.md §2.11): same positional
arguments, option names, and table specifiers, so recipe scripts can
invoke `kaldi-tpu <tool> ...` (or `python -m kaldi_tpu.cli <tool>`)
where they would invoke the reference binary.
"""

from __future__ import annotations

import importlib
from typing import Callable, Dict, List

# tool-name -> module path (module must define main(argv) -> int)
TOOLS: Dict[str, str] = {
    # featbin equivalents
    "compute-mfcc-feats": "kaldi_tpu.cli.feat_tools",
    "compute-fbank-feats": "kaldi_tpu.cli.feat_tools",
    "compute-spectrogram-feats": "kaldi_tpu.cli.feat_tools",
    "copy-feats": "kaldi_tpu.cli.feat_tools",
    "copy-matrix": "kaldi_tpu.cli.feat_tools",
    "compute-cmvn-stats": "kaldi_tpu.cli.feat_tools",
    "apply-cmvn": "kaldi_tpu.cli.feat_tools",
    "apply-cmvn-sliding": "kaldi_tpu.cli.feat_tools",
    "add-deltas": "kaldi_tpu.cli.feat_tools",
    "splice-feats": "kaldi_tpu.cli.feat_tools",
    "paste-feats": "kaldi_tpu.cli.feat_tools",
    "select-feats": "kaldi_tpu.cli.feat_tools",
    "subset-feats": "kaldi_tpu.cli.feat_tools",
    "feat-to-dim": "kaldi_tpu.cli.feat_tools",
    "feat-to-len": "kaldi_tpu.cli.feat_tools",
    "wav-to-duration": "kaldi_tpu.cli.feat_tools",
    "extract-segments": "kaldi_tpu.cli.feat_tools",
}


def get_tool(name: str) -> Callable[[List[str]], int]:
    module = importlib.import_module(TOOLS[name])
    func_name = name.replace("-", "_")
    return getattr(module, func_name)
