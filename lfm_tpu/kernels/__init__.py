"""Pallas TPU kernels for the hot ops (SURVEY.md §2.2: the reference's CUDA
dependency — torch conv/matmul/scaled_dot_product_attention — maps here).

Measured verdicts on v5e (DiT-L/2, north-star celeb256 shapes; round-2
numbers re-audited round 4 with a batch sweep — the winner is
BATCH-DEPENDENT, see the bench floor stage):

* ``dit_block`` — fused whole-block DiT forward used by SAMPLING
  (nn/dit_fused.py): weights stay VMEM-resident across grid cells, 4
  samples per cell. At batch 64 it is the best path (9.09 samples/s vs
  8.60 flash-module, 7.34 XLA-attention; round-4 sweep). At batch 16-32 it
  LOSES to the plain paths (b16: 7.84 fused vs 9.13 XLA-attention — the
  small per-cell occupancy wastes the MXU), so the sampler only engages it
  when explicitly requested and the bench headline reports whichever
  measured path is fastest.
* ``flash_attention`` — whole-sequence VMEM attention (fwd + bwd) at small
  T, blocked flash attention for long T (celeb512 ADM, T=4096). Batch-64
  velocity eval +13.6% over materialized-probs XLA attention (8.60 vs 7.34
  samples/s end-to-end); at batch<=16 XLA's own fusion of the T=256
  attention wins instead (9.13 vs 8.57). Long-T configs keep the flash win
  regardless (1.6x at T=4096). Dispatch gate: ``_pallas_ok`` (TPU +
  single-device semantics; shard_map bodies opt in via
  ``assume_local_devices``).
* ``dit_block_train`` — differentiable fused block (custom_vjp). LOST to
  the module path with ``remat_policy="dots"`` (172.7 vs 164.5 ms/step):
  residual-stream double-buffering erases the forward win and Pallas
  fragments the weight-grad reductions XLA contracts over the full batch.
  Kept as a tested non-default option; training uses the module path.
* ``groupnorm_silu`` — fused GroupNorm+SiLU for ADM/EDM UNets. LOST end to
  end (-11%, round 1): XLA's own fusion of the unfused ops wins. Kept for
  the record; not dispatched by default.
"""
