"""Every documented command line must parse against the current flags.

Extracts `python main.py ...` / `python -m iggcn_tpu.tools.* ...` lines
from the fenced code blocks of README.md, MIGRATION.md, and docs/*.md and
runs them through the real argparse parsers (parse only — nothing
executes). A renamed or removed flag now breaks the suite instead of
silently rotting the documentation.
"""
import glob
import os
import shlex

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOC_FILES = ([os.path.join(REPO, f) for f in ("README.md", "MIGRATION.md")]
             + sorted(glob.glob(os.path.join(REPO, "docs", "*.md"))))


def _fenced_blocks(text):
    parts = text.split("```")
    # odd indices are inside fences
    return parts[1::2]


def _logical_lines(block):
    """Join backslash continuations, strip inline comments."""
    out, cur = [], ""
    for raw in block.splitlines():
        line = raw.rstrip()
        if cur:
            line = cur + " " + line.lstrip()
            cur = ""
        if line.endswith("\\"):
            cur = line[:-1].rstrip()
            continue
        out.append(line.split(" #")[0].strip())
    if cur:
        out.append(cur.strip())
    return out


def _documented_commands():
    cmds = []
    for path in DOC_FILES:
        with open(path) as fh:
            text = fh.read()
        for block in _fenced_blocks(text):
            for line in _logical_lines(block):
                if line.startswith("python main.py") or (
                        line.startswith("python -m iggcn_tpu.tools.")):
                    cmds.append((os.path.basename(path), line))
    return cmds


COMMANDS = _documented_commands()


def _parser_for(tokens):
    if tokens[:2] == ["python", "main.py"]:
        import main
        return main.build_parser(), tokens[2:]
    mod_name = tokens[2]
    import importlib
    mod = importlib.import_module(mod_name)
    return mod.build_parser(), tokens[3:]


def test_docs_contain_commands():
    # the extraction itself must keep working (a silent zero would make
    # the per-command test below vacuous)
    assert len(COMMANDS) >= 15, COMMANDS


@pytest.mark.parametrize("src,line", COMMANDS,
                         ids=[f"{s}:{ln[:48]}" for s, ln in COMMANDS])
def test_documented_command_parses(src, line):
    tokens = shlex.split(line)
    # drop shell suffixes (backgrounding, redirects)
    tokens = [t for t in tokens if t not in ("&",)]
    parser, args = _parser_for(tokens)
    try:
        parser.parse_args(args)
    except SystemExit as e:  # argparse errors exit(2)
        pytest.fail(f"{src}: documented command no longer parses: "
                    f"{line!r} (exit {e.code})")
