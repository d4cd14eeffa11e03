"""Model factory: config -> velocity network (reference models/__init__.py:6-70)."""

from __future__ import annotations

import jax.numpy as jnp

from lfm_tpu.core.config import ModelConfig
from lfm_tpu.nn.dit import create_dit


def create_network(cfg: ModelConfig, *, dtype=jnp.float32, use_flash: bool = False,
                   remat: bool = False, remat_policy=None, scan_blocks: bool = True):
    """Dispatch: use_origin_adm -> ADM UNet; DiT-* -> DiT; else EDM nets."""
    if cfg.use_origin_adm:
        from lfm_tpu.nn.adm_unet import create_adm_unet

        return create_adm_unet(cfg, dtype=dtype, use_flash=use_flash, remat=remat)
    if cfg.is_dit:
        return create_dit(
            cfg.model_type,
            img_resolution=cfg.latent_size,
            in_channels=cfg.num_in_channels,
            label_dropout=cfg.label_dropout,
            num_classes=cfg.num_classes,
            dtype=dtype,
            use_flash=use_flash,
            remat=remat,
            remat_policy=remat_policy,
            scan_blocks=scan_blocks,
        )
    from lfm_tpu.nn.edm_unet import create_edm_network

    return create_edm_network(cfg, dtype=dtype, use_flash=use_flash, remat=remat)
