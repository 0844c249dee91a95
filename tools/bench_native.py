"""Native (C++) tier vs pure-Python fallback A/B (VERDICT r3 #8: the
claimed speedups belong in PERF.md with a named script behind them).
CPU-only — run under the scrubbed env:

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bench_native.py

Measures the three extensions in csrc/: the tape walker
(plan+signature of a deep Var graph), the CSV loader, and the BPE
encode hot loop.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from neuronika_tpu._build import ensure_native_built

print("native built:", ensure_native_built(), flush=True)


def timeit(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------- walker
import neuronika_tpu as nk  # noqa: E402
from neuronika_tpu._engine import executor as E  # noqa: E402

# a realistic wide tape: the define-by-run GPT graph (the walker's
# production workload), plus a deep elementwise chain as the worst case
import jax.numpy as jnp
from neuronika_tpu.models import transformer as TM

cfgw = TM.GPTConfig(vocab_size=256, n_layer=4, n_head=4, d_model=64,
                    d_ff=128, max_seq=64, dtype=jnp.float32)
pw, fw = TM.build_var_model(cfgw, batch=1, seq=64)
ids = np.zeros((64,), "float32")
lossw = fw(nk.from_ndarray(ids)).log_softmax(1).t().nll(
    nk.from_ndarray(ids), nk.Reduction.Mean)
root = lossw.node

assert E._native_tape is not None, "extension missing"
nat = timeit(lambda: E._native_tape.plan_and_sign(root))


def py_walk():
    tape, leaves = E._plan(root)
    return E._signature(tape, leaves)


py = timeit(py_walk)
t_n, l_n, s_n = E._native_tape.plan_and_sign(root)
t_p, l_p = E._plan(root)
assert len(t_n) == len(t_p) and s_n == E._signature(tuple(t_p), l_p), \
    "native walker diverged from the Python oracle"
print(f"tape walker (var-GPT tape, {len(t_n)} op nodes): "
      f"native {nat*1e3:.2f} ms, python {py*1e3:.2f} ms -> "
      f"{py/nat:.1f}x", flush=True)

# ------------------------------------------------------------------- csv
from neuronika_tpu import data as D  # noqa: E402

rows, cols = 50000, 32
arr = np.random.rand(rows, cols).astype(np.float32)
with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
    f.write(",".join(f"c{i}" for i in range(cols)) + "\n")
    np.savetxt(f, arr, delimiter=",", fmt="%.6f")
    path = f.name

dl = D.DataLoader()
nat = timeit(lambda: D._try_native_csv(path, ",", True), reps=3)


def py_csv():
    with open(path, "r", newline="") as fh:
        return dl.from_reader(fh, (cols,))


py = timeit(py_csv, reps=3)
fast = D._try_native_csv(path, ",", True)
slow = py_csv().records()
np.testing.assert_allclose(fast, np.asarray(slow).reshape(rows, cols),
                           atol=1e-5)
os.unlink(path)
print(f"csv loader ({rows}x{cols}): native {nat*1e3:.1f} ms, "
      f"python {py*1e3:.1f} ms -> {py/nat:.1f}x", flush=True)

# ------------------------------------------------------------------- bpe
from neuronika_tpu.data import tokenizer as TK  # noqa: E402

corpus = ("the quick brown fox jumps over the lazy dog; "
          "pack my box with five dozen liquor jugs. ") * 40
bpe = TK.BpeTokenizer.train(corpus, vocab_size=400)
text = corpus * 60          # ~200 KB

assert TK._native() is not None, "extension missing"
nat = timeit(lambda: bpe.encode(text), reps=3)
saved = TK._NATIVE
try:
    TK._NATIVE = None        # force the Python hot loop
    ref_ids = bpe.encode(text[:20000])
    py = timeit(lambda: bpe.encode(text), reps=1) # 1 rep: it is slow
finally:
    TK._NATIVE = saved
assert bpe.encode(text[:20000]) == ref_ids, "native BPE diverged"
print(f"bpe encode ({len(text)//1000} KB): native {nat*1e3:.1f} ms, "
      f"python {py*1e3:.1f} ms -> {py/nat:.1f}x", flush=True)
print("DONE", flush=True)
