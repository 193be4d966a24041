"""Superseded decode kernels, quarantined from the production surface.

* decode_kernel (v1/v2): first fused per-step attempts — superseded by
  decode_kernel_v3/v4 (per-step) and decode_kernel_v6 (persistent).
* decode_kernel_v5: the whole-sequence persistent kernel in batch-major
  layout.  Kept as the ablation instrument whose in-situ ladder located
  the VPU lane/sublane wall that motivated v6's transposed-network layout
  (see its module docstring for the Mosaic lessons record).

Both stay parity-tested (tests/test_decode_kernel.py, _v5.py) but are NOT
part of the shipped API: production decode is ops.decode_kernel_v3/_v4/_v6
plus the window-attention kernels.
"""
