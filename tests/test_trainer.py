"""Trainer (neuronika_tpu/train.py): the high-level loop — fused step +
warmup-cosine schedule + metrics JSONL + orbax checkpoints/resume +
periodic eval — over the functional transformer tier."""
from __future__ import annotations

import json
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuronika_tpu.models import transformer as T
from neuronika_tpu.train import Trainer, warmup_cosine


def _cfg():
    return T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                       d_ff=64, max_seq=16, dtype=jnp.float32)


def _batches(n, B=4, S=16, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        toks = rng.integers(0, 32, (B, S)).astype(np.int32)
        yield toks, np.roll(toks, -1, axis=1)


class TestWarmupCosine:
    def test_schedule_shape(self):
        lr = warmup_cosine(1.0, warmup_steps=10, total_steps=110,
                           min_lr=0.1)
        assert lr(0) == pytest.approx(1.0 / 10)      # first warmup step
        assert lr(9) == pytest.approx(1.0)           # warmup done
        assert lr(60) == pytest.approx(
            0.1 + 0.45 * (1 + math.cos(math.pi * 0.5)), abs=1e-6)
        assert lr(110) == pytest.approx(0.1)         # floor at the end
        assert lr(10 ** 6) == pytest.approx(0.1)     # clamped after

    def test_constant_after_warmup_without_total(self):
        lr = warmup_cosine(3e-4, warmup_steps=4)
        assert lr(3) == pytest.approx(3e-4)
        assert lr(1000) == pytest.approx(3e-4)


class TestTrainer:
    def test_fit_logs_checkpoints_and_evals(self, tmp_path):
        log = tmp_path / "run.jsonl"
        tr = Trainer(_cfg(), key=jax.random.key(0), lr=1e-2,
                     warmup_steps=2, total_steps=50,
                     checkpoint_dir=str(tmp_path / "ckpt"),
                     checkpoint_every=5, log_path=str(log),
                     eval_every=5,
                     eval_batches=lambda: _batches(2, seed=99))
        summary = tr.fit(_batches(10), steps=10)
        assert tr.step_num == 10
        lines = [json.loads(l) for l in log.read_text().splitlines()]
        assert len(lines) == 10
        assert {"loss", "loss_ema", "lr", "step"} <= set(lines[-1])
        assert "eval_loss" in lines[4] and tr.last_eval is not None
        assert tr.last_eval["perplexity"] > 0
        assert summary  # metrics summary returned
        steps = tr._ckpt.steps()
        assert 10 in steps and 5 in steps

    def test_resume_restores_exact_state(self, tmp_path):
        kw = dict(key=jax.random.key(0), lr=1e-2,
                  checkpoint_dir=str(tmp_path / "ckpt"),
                  checkpoint_every=100)
        tr = Trainer(_cfg(), **kw)
        tr.fit(_batches(6), steps=6)      # final save is forced
        leaf = np.asarray(tr.params["blocks"]["qkv"])

        tr2 = Trainer(_cfg(), **kw)
        assert tr2.resume() == 6
        np.testing.assert_array_equal(
            np.asarray(tr2.params["blocks"]["qkv"]), leaf)
        # continues from the restored step with the restored PRNG:
        # both trainers must produce the SAME next step
        b = list(_batches(1, seed=7))
        l1 = float(tr.train_step(*b[0]))
        l2 = float(tr2.train_step(*b[0]))
        assert l1 == pytest.approx(l2, rel=1e-6)
        assert tr2.step_num == 7

    def test_loss_decreases_on_fixed_batch(self):
        tr = Trainer(_cfg(), key=jax.random.key(0), lr=1e-2)
        toks = np.tile(np.arange(16, dtype=np.int32), (4, 1))
        tgts = np.roll(toks, -1, axis=1)
        first = float(tr.train_step(toks, tgts))
        for _ in range(15):
            last = float(tr.train_step(toks, tgts))
        assert last < first

    def test_sharded_trainer_on_mesh(self):
        from neuronika_tpu import parallel

        mesh = parallel.make_mesh([("dp", 4), ("tp", 2)])
        tr = Trainer(_cfg(), key=jax.random.key(0), lr=1e-2, mesh=mesh)
        toks = np.tile(np.arange(16, dtype=np.int32), (8, 1))
        tgts = np.roll(toks, -1, axis=1)
        first = float(tr.train_step(toks, tgts))
        for _ in range(5):
            last = float(tr.train_step(toks, tgts))
        assert last < first

    def test_save_without_dir_raises(self):
        tr = Trainer(_cfg(), key=jax.random.key(0))
        with pytest.raises(ValueError, match="checkpoint_dir"):
            tr.save()
