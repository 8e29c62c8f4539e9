"""Shared TPU kernel tuning constants.

Single home for the VMEM budget handed to Mosaic so the LSTM and CE
kernels can't silently diverge on a retune (VERDICT.md r2 "weak" #6).

100 MB: measured working set of the training LSTM kernel at B=64/H=1024
is ~49 MB; 100 MB admits B=128 while leaving headroom below the ~128 MB
physical VMEM of v5e/v6e cores for Mosaic's own buffers.
"""

VMEM_LIMIT_BYTES = 100 * 1024 * 1024
