"""Pallas TPU kernels for the hot ops (SURVEY.md §2.2: the reference's CUDA
dependency — torch conv/matmul/scaled_dot_product_attention — maps here).

Measured verdicts on v5e (DiT-L/2, north-star celeb256 shapes, round 2):

* ``dit_block`` — fused whole-block DiT forward used by SAMPLING
  (nn/dit_fused.py): weights stay VMEM-resident across grid cells, 4
  samples per cell. 73.2 -> 67.7 ms per 100-NFE batch-64 velocity eval;
  end-to-end bench 8.44 -> 9.11 samples/s.
* ``flash_attention`` — whole-sequence VMEM attention (fwd + bwd) at small
  T, blocked flash attention for long T (celeb512 ADM, T=4096). +13.6%
  velocity eval at the 256-token north-star shape; probs never hit HBM in
  either direction. Dispatch gate: ``_pallas_ok`` (TPU + single-device
  semantics; shard_map bodies opt in via ``assume_local_devices``).
* ``dit_block_train`` — differentiable fused block (custom_vjp). LOST to
  the module path with ``remat_policy="dots"`` (172.7 vs 164.5 ms/step):
  residual-stream double-buffering erases the forward win and Pallas
  fragments the weight-grad reductions XLA contracts over the full batch.
  Kept as a tested non-default option; training uses the module path.
* ``groupnorm_silu`` — fused GroupNorm+SiLU for ADM/EDM UNets. LOST end to
  end (-11%, round 1): XLA's own fusion of the unfused ops wins. Kept for
  the record; not dispatched by default.
"""
