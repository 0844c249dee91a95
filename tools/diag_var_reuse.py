import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
import neuronika_tpu as nk
from neuronika_tpu import optim
from neuronika_tpu.models import transformer as T
from bench import _device_peak

S = 1024
cfg = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=6, d_model=768,
                  d_ff=3072, max_seq=S, dtype=jnp.float32)
nk.seed(0); np.random.seed(0)
params, fwd = T.build_var_model(cfg, batch=1, seq=S)
opt = optim.Adam(1e-4)
opt.register_all(params)
ids = (np.random.randint(0, cfg.vocab_size, size=(S,))).astype("float32")
tgt = np.roll(ids, -1)

# graph-reuse pattern: build ONCE, swap leaf data per step
xv = nk.from_ndarray(ids)
tv = nk.from_ndarray(tgt)
loss = fwd(xv).log_softmax(1).t().nll(tv, nk.Reduction.Mean)
opt.train_step(loss, block=True)
t0 = time.perf_counter()
steps = 12
for i in range(steps):
    xv.node.value = jnp.asarray(ids)   # same shapes, new data slot
    tv.node.value = jnp.asarray(tgt)
    opt.train_step(loss, block=False)
lv = float(loss.item())
dt = (time.perf_counter() - t0) / steps
print(f"graph-reuse: {S/dt:.1f} tok/s ({dt*1e3:.1f} ms/step), loss {lv:.4f}", flush=True)

# build-per-step (current bench) for contrast
def one(block=False):
    l = fwd(nk.from_ndarray(ids)).log_softmax(1).t().nll(
        nk.from_ndarray(tgt), nk.Reduction.Mean)
    opt.train_step(l, block=block)
    return l
one(block=True)
t0 = time.perf_counter()
for _ in range(8):
    l = one()
l.item()
dt2 = (time.perf_counter() - t0) / 8
print(f"rebuild-per-step: {S/dt2:.1f} tok/s ({dt2*1e3:.1f} ms/step)", flush=True)
print("DONE", flush=True)
