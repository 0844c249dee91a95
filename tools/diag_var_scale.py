import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
import neuronika_tpu as nk
from neuronika_tpu import optim
from neuronika_tpu.models import transformer as T

S = 1024
for L in (1, 2, 4, 8):
    cfg = T.GPTConfig(vocab_size=16384, n_layer=L, n_head=6, d_model=768,
                      d_ff=3072, max_seq=S, dtype=jnp.float32)
    nk.seed(0); np.random.seed(0)
    params, fwd = T.build_var_model(cfg, batch=1, seq=S)
    opt = optim.Adam(1e-4)
    opt.register_all(params)
    ids = (np.random.randint(0, cfg.vocab_size, size=(S,))).astype("float32")
    tgt = np.roll(ids, -1)
    xv = nk.from_ndarray(ids); tv = nk.from_ndarray(tgt)
    loss = fwd(xv).log_softmax(1).t().nll(tv, nk.Reduction.Mean)
    opt.train_step(loss, block=True)
    t0 = time.perf_counter()
    for i in range(10):
        xv.node.value = jnp.asarray(ids); tv.node.value = jnp.asarray(tgt)
        opt.train_step(loss, block=False)
    loss.item()
    dt = (time.perf_counter() - t0) / 10
    # python-side-only cost: trace-cache path with device untouched?
    t0 = time.perf_counter()
    sigs = 0
    print(f"L={L}: {dt*1e3:.1f} ms/step", flush=True)
print("DONE", flush=True)
