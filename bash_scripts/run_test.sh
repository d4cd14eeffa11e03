#!/usr/bin/env bash
# Sampling/eval launcher — same interface as the reference's
# bash_scripts/run_test.sh: `bash bash_scripts/run_test.sh test_args/<name>.txt`
# The argfile KEY=VALUE format is identical; lfm_tpu parses it directly.
set -e
echo "Argument file: $1"
cat "$1"
python -m lfm_tpu.cli.main sample --argfile "$1" "${@:2}"
