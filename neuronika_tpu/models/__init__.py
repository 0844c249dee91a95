"""Model configurations (quickstart MLP, MNIST CNN, char-RNN, mini-GPT)."""
__all__ = []
