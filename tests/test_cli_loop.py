"""CLI + training-loop integration tests (tiny, synthetic, CPU mesh)."""

import json
import os
import sys

import numpy as np
import pytest

from lfm_tpu.core.config import Config, DataConfig, ModelConfig, SampleConfig, TrainConfig


def test_train_loop_end_to_end(tmp_path, mesh8):
    """Full loop: synthetic latent data -> train 1 epoch -> checkpoints."""
    from lfm_tpu.train.loop import train

    config = Config(
        exp="smoke",
        dataset="synthetic_latent",
        output_dir=str(tmp_path),
        model=ModelConfig(model_type="DiT-T/2", image_size=64, num_classes=1),
        train=TrainConfig(batch_size=16, num_epoch=0, lr=1e-3, no_lr_decay=True,
                          use_ema=True, save_content=True, save_content_every=1,
                          save_ckpt_every=1, plot_every=100, precision="f32"),
    )

    class TinyLatents:
        num_classes = 1

        def __len__(self):
            return 32

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return rng.normal(size=(8, 8, 4)).astype(np.float32), 0

    state = train(config, dataset=TinyLatents(), mesh=mesh8, log_fn=lambda *a: None)
    assert int(state.step) == 2  # 32/16 per epoch, 1 epoch (num_epoch=0 -> range(0,1))
    exp = config.exp_path
    assert os.path.isdir(os.path.join(exp, "content"))
    assert os.path.isdir(os.path.join(exp, "model_0"))
    assert os.path.exists(os.path.join(exp, "config.json"))

    # resume continues from the saved epoch
    import dataclasses

    config2 = dataclasses.replace(
        config, train=dataclasses.replace(config.train, num_epoch=1, resume=True)
    )
    state2 = train(config2, dataset=TinyLatents(), mesh=mesh8, log_fn=lambda *a: None)
    assert int(state2.step) == 4  # resumed at epoch 1, one more epoch


def test_cli_sample_smoke(tmp_path, monkeypatch):
    """CLI sample with random weights writes a grid."""
    monkeypatch.chdir(tmp_path)
    from lfm_tpu.cli.main import main

    main([
        "sample", "--dataset", "synthetic", "--model_type", "DiT-T/2",
        "--image_size", "64", "--num_classes", "1",
        "--method", "euler", "--steps", "2", "--batch_size", "4",
    ])
    outs = [f for f in os.listdir(".") if f.startswith("samples_")]
    assert outs, "no sample grid written"


def test_cli_config_resolution():
    from lfm_tpu.cli.main import _build_parser, _resolve_config

    args = _build_parser().parse_args([
        "sample", "--preset", "celeb256_dit", "--method", "euler",
        "--steps", "10", "--batch_size", "8",
    ])
    config = _resolve_config(args)
    assert config.model.model_type == "DiT-L/2"
    assert config.sample.method == "euler"
    assert config.sample.num_steps == 10
    assert config.sample.batch_size == 8
    assert config.sample.epoch_id == 475  # preserved from preset


def test_cli_fid_smoke(tmp_path, monkeypatch):
    """CLI fid end-to-end vs synthetic stats (random inception/VAE weights)."""
    monkeypatch.chdir(tmp_path)
    import numpy as np

    from lfm_tpu.eval.fid import save_statistics
    from lfm_tpu.cli.main import main

    rng = np.random.default_rng(0)
    acts = rng.normal(size=(64, 2048)).astype(np.float64)
    save_statistics("stats.npy", acts.mean(0), np.cov(acts, rowvar=False))

    main([
        "fid", "--dataset", "synthetic", "--model_type", "DiT-T/2",
        "--image_size", "64", "--num_classes", "1",
        "--method", "euler", "--steps", "2", "--batch_size", "8",
        "--n_sample", "16", "--real_img_dir", "stats.npy",
    ])


def test_cli_test_semantic_smoke(tmp_path, monkeypatch):
    """test-semantic CLI: seg dataset -> conditional sampling -> JPEGs."""
    monkeypatch.chdir(tmp_path)
    import numpy as np
    from PIL import Image

    root = tmp_path / "ade"
    (root / "images").mkdir(parents=True)
    (root / "annotations").mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(2):
        name = f"{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            root / "images" / name)
        Image.fromarray(rng.integers(0, 5, (40, 40), np.uint8), mode="L").save(
            root / "annotations" / f"{i}.png")
        names.append(name)
    (root / "val.txt").write_text("\n".join(names))

    from lfm_tpu.cli.main import main

    main([
        "test-semantic", "--seg_dataset", "ade20k", "--datadir", str(root),
        "--dataset", "ade20k", "--model_type", "adm", "--use_origin_adm",
        "--image_size", "32", "--nf", "32", "--ch_mult", "1", "2",
        "--attn_resolutions", "2", "--num_res_blocks", "1",
        "--method", "euler", "--steps", "2", "--batch_size", "2",
        "--n_sample", "2", "--save_dir", str(tmp_path / "sem_out"),
    ])
    import os

    assert sorted(os.listdir(tmp_path / "sem_out")) == ["0.jpg", "1.jpg"]
