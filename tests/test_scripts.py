"""The bash launcher surface stays name-compatible with the reference.

The reference ships exactly five scripts (reference bash_scripts/: run.sh,
run_test.sh, run_test_ddp.sh, run_test_cls.sh, run_test_cls_ddp.sh —
SURVEY.md §2.1 "Bash CLI" row); users drive every workflow through them
with sourced test_args/*.txt argfiles. These tests pin (a) that each
reference script name exists here, (b) that every `python -m
lfm_tpu.cli.main <sub> ...` invocation the scripts construct parses
against the real CLI parser — catching a renamed/removed flag before a
user's shell does.
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


def _extract_flags(text):
    """Flags passed to `python -m lfm_tpu.cli.main` across continuation
    lines, plus the subcommand."""
    m = re.search(r"python -m lfm_tpu\.cli\.main (\w[\w-]*)((?:.|\\\n)*)",
                  text)
    if not m:
        return None, []
    sub = m.group(1)
    # first non-continued command: stop at the first line not ending in \
    lines, body = [], m.group(2)
    for ln in body.splitlines():
        lines.append(ln)
        if not ln.rstrip().endswith("\\"):
            break
    flags = re.findall(r"(--[\w-]+)", "\n".join(lines))
    return sub, flags


@pytest.mark.parametrize("script", sorted(
    f for f in os.listdir(SCRIPTS) if f.endswith(".sh")))
def test_script_flags_parse_against_cli(script):
    text = open(os.path.join(SCRIPTS, script)).read()
    sub, flags = _extract_flags(text)
    if sub is None:  # run.sh keeps its invocations commented out
        assert script == "run.sh"
        # still check the commented recipes' flags exist on `train`
        flags = sorted(set(re.findall(r"(--[\w-]+)", text)))
        sub = "train"
    parser = _build_parser()
    sub_actions = next(a for a in parser._actions
                       if hasattr(a, "choices") and a.choices)
    assert sub in sub_actions.choices, (script, sub)
    known = {s for a in sub_actions.choices[sub]._actions
             for s in a.option_strings}
    unknown = [f for f in flags if f not in known]
    assert not unknown, (script, unknown)


def test_cls_ddp_flag_combo_parses():
    args = _build_parser().parse_args(
        ["fid", "--argfile", "test_args/imnet_dit.txt",
         "--real_img_dir", "x.npy", "--inception_ckpt", "y.pth",
         "--num_classes", "1000", "--label_dropout", "0.1",
         "--cfg_scale", "1.5"])
    assert args.cmd == "fid" and args.cfg_scale == 1.5
