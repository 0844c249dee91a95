"""Model configurations from BASELINE.md: quickstart MLP, MNIST CNN,
char-LSTM/GRU, mini-GPT2 transformer (flagship)."""
from . import bert, lora, resnet, t5, transformer, vit  # noqa: F401
from .cnn import MnistCNN  # noqa: F401
from .mlp import MLP  # noqa: F401
from .rnn import CharRNN  # noqa: F401

__all__ = ["transformer", "resnet", "vit", "MLP", "MnistCNN", "CharRNN"]
