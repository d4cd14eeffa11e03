"""lfm_tpu — TPU-native latent flow-matching framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of VinAIResearch/LFM ("Flow Matching
in Latent Space", arXiv:2307.08698): flow-matching training of velocity-field
networks (DiT / ADM / EDM families) in the latent space of a frozen SD VAE,
jit-compiled ODE sampling (adaptive dopri5 et al. + fixed-step Karras loops),
classifier-free guidance, conditional downstream tasks, and sharded FID
evaluation over a TPU mesh.
"""

__version__ = "0.1.0"
