"""The bash launcher surface stays name-compatible with the reference.

The reference ships exactly five scripts (reference bash_scripts/: run.sh,
run_test.sh, run_test_ddp.sh, run_test_cls.sh, run_test_cls_ddp.sh —
SURVEY.md §2.1 "Bash CLI" row); users drive every workflow through them
with sourced test_args/*.txt argfiles. These tests pin (a) that each
reference script name exists here, (b) that EVERY `python -m
lfm_tpu.cli.main <sub> ...` invocation the scripts construct — including
run.sh's commented-out training recipes and flags on backslash-continued
lines — parses against the real CLI parser, catching a renamed/removed
flag before a user's shell does.
"""

import os
import re

import pytest

from lfm_tpu.cli.main import _build_parser

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "bash_scripts")

REFERENCE_SCRIPT_NAMES = [
    "run.sh", "run_test.sh", "run_test_ddp.sh",
    "run_test_cls.sh", "run_test_cls_ddp.sh",
]


def test_reference_script_names_all_present():
    for name in REFERENCE_SCRIPT_NAMES:
        assert os.path.exists(os.path.join(SCRIPTS, name)), name


def _extract_invocations(text):
    """Every (subcommand, [--flags]) a script constructs, with
    backslash-continued lines joined and leading comment markers stripped
    (run.sh keeps its recipes commented out — they are still the product)."""
    logical, cur = [], ""
    for raw in text.splitlines():
        ln = re.sub(r"^\s*#\s?", "", raw)  # commented recipes count too
        cont = ln.rstrip().endswith("\\")
        cur += " " + (ln.rstrip()[:-1] if cont else ln)
        if not cont:
            logical.append(cur)
            cur = ""
    if cur:
        logical.append(cur)
    out = []
    for ln in logical:
        m = re.search(r"python -m lfm_tpu\.cli\.main\s+(\w[\w-]*)(.*)", ln)
        if m:
            out.append((m.group(1), re.findall(r"(--[\w-]+)", m.group(2))))
    return out


def test_extractor_sees_continuation_flags():
    sub, flags = _extract_invocations(
        "python -m lfm_tpu.cli.main fid --argfile a.txt \\\n"
        "    --cfg_scale 1.5 \"${@:4}\"\n")[0]
    assert sub == "fid" and flags == ["--argfile", "--cfg_scale"]


@pytest.mark.parametrize("script", sorted(
    f for f in os.listdir(SCRIPTS) if f.endswith(".sh")))
def test_script_flags_parse_against_cli(script):
    text = open(os.path.join(SCRIPTS, script)).read()
    invocations = _extract_invocations(text)
    assert invocations, f"{script}: no lfm_tpu.cli.main invocation found"
    parser = _build_parser()
    sub_actions = next(a for a in parser._actions
                       if hasattr(a, "choices") and a.choices)
    for sub, flags in invocations:
        assert sub in sub_actions.choices, (script, sub)
        known = {s for a in sub_actions.choices[sub]._actions
                 for s in a.option_strings}
        unknown = [f for f in flags if f not in known]
        assert not unknown, (script, sub, unknown)


def test_cls_ddp_flag_combo_parses():
    args = _build_parser().parse_args(
        ["fid", "--argfile", "test_args/imnet_dit.txt",
         "--real_img_dir", "x.npy", "--inception_ckpt", "y.pth",
         "--num_classes", "1000", "--label_dropout", "0.1",
         "--cfg_scale", "1.5"])
    assert args.cmd == "fid" and args.cfg_scale == 1.5
