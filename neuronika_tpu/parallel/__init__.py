"""Multi-chip scale-out via jax.sharding (filled in parallel.py)."""
from .mesh import *  # noqa: F401,F403
