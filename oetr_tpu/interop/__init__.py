"""Interop with the reference PyTorch OETR (weights + measurement).

- ``refshim``: dependency shims (torchvision/kornia/timm) that let the
  *unmodified* reference model at /root/reference run on this host's
  torch-CPU, for baseline measurement and numerical parity checks.
- ``torch_convert``: reference ``state_dict`` -> flax params converter,
  the weight-loading story for released OETR checkpoints
  (/root/reference/dloc/core/overlap_features.py:30-42).
"""
