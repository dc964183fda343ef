"""Regenerate docs/TOOLS.md from the live CLI registry.

Descriptions come from each tool function's ParseOptions usage string
(first sentence).  Run: python docs/gen_tools_md.py
"""

import importlib
import inspect
import os
import re

import kaldi_tpu.cli as cli

HERE = os.path.dirname(os.path.abspath(__file__))


def describe(module_name: str, func_name: str) -> str:
    mod = importlib.import_module(module_name)
    fn = getattr(mod, func_name)
    try:
        src = inspect.getsource(fn)
    except OSError:
        return ""
    m = re.search(r'ParseOptions\(\s*(f?"(?:[^"\\]|\\.)*"'
                  r'(?:\s*f?"(?:[^"\\]|\\.)*")*)', src)
    if not m:
        return ""
    lit = m.group(1)
    parts = re.findall(r'f?"((?:[^"\\]|\\.)*)"', lit)
    text = "".join(parts).replace("\\n", "\n")
    first = text.split("\n")[0].strip()
    # drop trailing "(tool.cc)" reference notes from the headline
    return first


def main():
    lines = [
        "# CLI tools",
        "",
        "All tools speak the reference's rspecifier/wspecifier table",
        "syntax and option names; invoke as",
        "`python -m kaldi_tpu.cli <tool> [options] args...`.",
        "",
        "This file is GENERATED from the registry "
        "(docs/gen_tools_md.py);",
        "the count below is `len(kaldi_tpu.cli.TOOLS)`.",
        "",
        f"{len(cli.TOOLS)} tools:",
        "",
    ]
    for name in sorted(cli.TOOLS):
        module, func = cli.TOOLS[name]
        desc = describe(module, func)
        lines.append(f"- **{name}** — {desc}")
    with open(os.path.join(HERE, "TOOLS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote TOOLS.md with {len(cli.TOOLS)} tools")


if __name__ == "__main__":
    main()
