"""srsran_tpu — a TPU-native LTE software-radio PHY framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of srsLTE/srsRAN
(reference: lucabaldesi/srsRAN): OFDM, synchronization, channel estimation,
MIMO equalization, FEC (Viterbi/turbo), and the LTE physical channels —
batched, jit-compiled, and sharded across TPU device meshes.
"""

__version__ = "0.1.0"
