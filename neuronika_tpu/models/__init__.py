"""Model configurations from BASELINE.md: quickstart MLP, MNIST CNN,
char-LSTM/GRU, mini-GPT2 transformer (flagship)."""
from . import transformer  # noqa: F401

__all__ = ["transformer"]
