"""Pallas TPU kernel tier — the native-kernel replacement for the
reference's Rust/ndarray/BLAS compute substrate (SURVEY.md §7).

Kernels: tiled MXU matmul, fused softmax/log-softmax, causal flash
attention (fwd + bwd with custom VJP). Each has an XLA fallback and is
tested against it (interpreter mode on CPU, compiled on TPU).
"""
from .attention import flash_attention, reference_attention  # noqa: F401
from .conv import conv2d_direct  # noqa: F401
from .matmul import matmul  # noqa: F401
from .softmax import softmax_last_axis  # noqa: F401

__all__ = [
    "flash_attention", "reference_attention", "matmul",
    "softmax_last_axis", "conv2d_direct",
]
