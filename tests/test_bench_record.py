"""The bench parent's record logic — the JSON line the driver parses.

bench.py's parent is deliberately stdlib-only (stages run in
subprocesses), so these tests import it directly without a backend and
pin the _Record state machine: headline max-across-stages with per-stage
config labels, and the set-or-clear semantics of the failed/skipped
markers (a stage that fails then succeeds on retry must not stay labeled
failed in the final record — the driver treats that key as ground truth).
"""

import json

import bench


def _emitted(capsys):
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln]
    return json.loads(lines[-1])


def test_floor_sets_headline(capsys):
    rec = bench._Record()
    rec.absorb("floor", {"floor_samples_per_sec": 9.1,
                         "floor_sample_mfu": 0.78,
                         "floor_config": "batch 16, XLA attention"})
    rec.emit()
    out = _emitted(capsys)
    assert out["value"] == 9.1
    assert "batch 16, XLA attention [floor stage]" in out["unit"]
    assert out["vs_baseline"] == round(9.1 / bench.A100_BASELINE_SAMPLES_PER_SEC, 3)


def test_fused_headline_uses_stage_config(capsys):
    """BENCH_FUSED_BATCH can move the fused stage off the module BATCH
    constant; the headline unit must quote the stage's own config."""
    rec = bench._Record()
    rec.absorb("floor", {"floor_samples_per_sec": 9.0,
                         "floor_sample_mfu": 0.78,
                         "floor_config": "batch 16, XLA attention"})
    rec.absorb("fused", {"samples_per_sec_fused": 9.5,
                         "sample_mfu_fused": 0.8,
                         "fused_config": "batch 32, samples_per_cell 8"})
    rec.emit()
    out = _emitted(capsys)
    assert out["value"] == 9.5
    assert "batch 32, samples_per_cell 8" in out["unit"]
    assert out["extra"]["sample_mfu"] == 0.8


def test_slower_stage_never_outranks(capsys):
    rec = bench._Record()
    rec.absorb("floor", {"floor_samples_per_sec": 9.1,
                         "floor_sample_mfu": 0.78,
                         "floor_config": "batch 16, XLA attention"})
    rec.absorb("sampling", {"samples_per_sec": 8.6, "sample_mfu": 0.73,
                            "sampling_config": "flash attention"})
    rec.emit()
    out = _emitted(capsys)
    assert out["value"] == 9.1 and "[floor stage]" in out["unit"]


def test_failed_label_cleared_after_retry_success(capsys):
    rec = bench._Record()
    rec.failed.append("train")
    rec.emit()
    assert _emitted(capsys)["extra"]["failed"] == "train"
    # retry pass succeeds (main() removes it and absorbs the result)
    rec.failed.remove("train")
    rec.absorb("train", {"train_steps_per_sec": 6.4})
    rec.emit()
    out = _emitted(capsys)
    assert "failed" not in out["extra"]
    assert out["extra"]["train_steps_per_sec"] == 6.4


def test_skipped_stages_get_cached_prior_run_on_final_emit(capsys):
    rec = bench._Record()
    rec.absorb("floor", {"floor_samples_per_sec": 9.1,
                         "floor_sample_mfu": 0.78,
                         "floor_config": "batch 16, XLA attention"})
    rec.skipped.append("adm256")
    rec.emit(final=True)
    out = _emitted(capsys)
    assert out["extra"]["skipped"] == "adm256"
    cached = out["extra"]["cached_prior_run"]
    # tools/bench_cache.json carries a prior on-chip adm256 measurement
    assert "adm256" in cached and "note" in cached
    assert cached["adm256"]["adm256_samples_per_sec"] > 0


def test_est_prefers_warm_when_entry_committed():
    # every default stage has a committed AOT entry in this repo
    for name in bench.STAGES:
        cold, warm = bench.STAGE_EST[name]
        assert bench._est(name) == warm
