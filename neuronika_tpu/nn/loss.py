"""Free-function loss criteria — the pre-rewrite `nn::loss` module the
reference documents (examples/quickstart.rs:4, facade docs src/lib.rs) whose
implementation lives as Var/VarDiff methods in the snapshot
(var.rs:440-521). These wrappers forward to the method forms."""

from __future__ import annotations

from ..variable import Reduction, Var

__all__ = [
    "Reduction", "mae_loss", "mse_loss", "bce_loss",
    "bce_with_logits_loss", "kldiv_loss", "nll_loss",
]


def mae_loss(input: Var, target: Var, reduction: str = Reduction.Mean):
    return input.mae(target, reduction)


def mse_loss(input: Var, target: Var, reduction: str = Reduction.Mean):
    return input.mse(target, reduction)


def bce_loss(input: Var, target: Var, reduction: str = Reduction.Mean):
    return input.bce(target, reduction)


def bce_with_logits_loss(input: Var, target: Var, reduction: str = Reduction.Mean):
    return input.bce_with_logits(target, reduction)


def kldiv_loss(input: Var, target: Var, reduction: str = Reduction.Mean):
    return input.kldiv(target, reduction)


def nll_loss(input: Var, target: Var, reduction: str = Reduction.Mean):
    return input.nll(target, reduction)
