"""Direct (im2col-free) Conv2d Pallas kernels.

The reference's conv is an im2col unfold + per-sample GEMM parallelised
with rayon (node/convolution/mod.rs:85-123). On TPU the idiomatic form is a
sum of shifted MXU matmuls: for every kernel tap (i, j)

    out[n, rows, :, :] += x[n, rows + i·dh, j·dw :, :] @ W[i, j]    (NHWC)

**Layout is the whole game for Mosaic.** Two load-bearing choices:

* NHWC + HWIO: the channel dim lands on the 128-wide lane axis, tap
  offsets land on sublane dims where static offsets are free, and leading
  (non-lane) dims merge for free in reshapes. (The r1 NCHW prototype
  needed lane-merging casts Mosaic rejects.)
* **flat-window addressing**: the naive per-tap slice
  `window[i:i+bh, j:j+wout, :]` is a *shifted crop* whose reshape to
  (bh·wout, Ci) repacks VMEM on every tap — 9 VPU copies per program
  dominated the r2 kernel (0.45 MFU vs XLA's 0.88). Instead the window
  is flattened ONCE to ((bh+kh-1)·W, Ci) and tap (i, j) is the contiguous
  slice starting at i·W + j: row-ends wrap into the next row's start, but
  those wrapped entries only affect the last kw-1 output columns, which
  the VALID crop throws away. Zero per-tap repacks; every tap is a pure
  (bh·W, Ci) @ (Ci, co_block) MXU dot.

Stride-s convs run as a sum of s·s phase convolutions (space-to-batch on
input parities: out = Σ_{pi,pj} conv1(x[pi::s, pj::s], w[pi::s, pj::s])),
each on the same stride-1 kernel — this is how the NHWC ResNet stem
(7x7/s2) and downsample convs run on the Pallas tier.

Backwards by kernel composition: d(input) is a full-correlation with the
flipped/io-swapped kernel on the SAME forward kernel; d(kernel) is its own
accumulating GEMM kernel (grid revisits over the batch) — the reference's
col2im equivalent (node/convolution/mod.rs:146-294).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv2d_nhwc_kernel(x_ref, w_ref, o_ref, *, kh, kw, dh, dw, bh):
    # x_ref (1, Hpad, W, Ci) full sample; w_ref (kh, kw, Ci, co_b);
    # o_ref (1, bh, W, co_b) FULL width — the caller crops the last
    # dw·(kw-1) columns (they carry the flat-window wraparound).
    #
    # Sublane alignment is the perf story here: the caller pads W to a
    # multiple of 16, so the (rows, W, Ci) -> (rows·W, Ci) flat view is a
    # layout no-op and row offsets (i·dh·W) hit sublane-tile boundaries.
    # Only the kw column shifts are misaligned — they are paid ONCE as kw
    # pre-shifted copies of the window (the naive per-tap flat slice paid
    # a full repack on every one of the kh·kw taps).
    ci = x_ref.shape[3]
    co = o_ref.shape[3]
    W = x_ref.shape[2]
    span = bh + dh * (kh - 1)           # rows any single shift must cover
    rows = span + (1 if kw > 1 else 0)

    if x_ref.shape[1] == rows:          # one row-block: static, no ds copy
        window = x_ref[0].reshape(rows * W, ci)
    else:
        qi = pl.program_id(1)
        row0 = pl.multiple_of(qi * bh, bh)
        window = x_ref[0, pl.ds(row0, rows), :, :].reshape(rows * W, ci)
    shifted = [window[j * dw:j * dw + span * W, :] for j in range(kw)]
    acc = jnp.zeros((bh * W, co), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            flat = shifted[j][i * dh * W:i * dh * W + bh * W, :]
            acc = acc + jnp.dot(flat, w_ref[i, j],
                                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bh, W, co).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "groups", "block_h", "block_co",
                     "interpret"),
)
def _conv2d_s1_nhwc(x, w, dilation=(1, 1), *, groups: int = 1,
                    block_h: int = 0,
                    block_co: int = 256, interpret: bool = False):
    """x (N, H, W, Ci) ⊛ w (kh, kw, Ci/groups, Co), stride 1, VALID →
    NHWC out. Grouped convs map each co-block's grid step to its group's
    lane slice of x (needs Ci/groups and Co/groups lane-aligned — the
    caller gates on that)."""
    N, H, W, Ci = x.shape
    kh, kw, Cik, Co = w.shape
    if Cik * groups != Ci or Co % groups:
        raise ValueError("channel/group mismatch")
    dh, dw = dilation
    Hout = H - dh * (kh - 1)
    Wout = W - dw * (kw - 1)
    if Hout <= 0 or Wout <= 0:
        raise ValueError("kernel larger than input")

    if block_h <= 0:
        # auto: ~32-row blocks that tile Hout with minimal padding (v5e
        # sweep: 0.71 MFU at even 28-row blocks vs 0.56 when a 24-row
        # block forces 29% row padding), capped so the window + acc stay
        # comfortably inside scoped VMEM at wide channel counts
        n_b = max(1, -(-Hout // 32))
        block_h = -(-Hout // n_b)
        while block_h * (W + 16) * max(Ci, 128) * 6 > 8e6 and block_h > 8:
            block_h = -(-block_h // 2)
    bh = min(block_h, Hout)
    bco = min(block_co, Co // groups)
    pad_co = (-Co) % bco if groups == 1 else 0
    if pad_co:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad_co)))
    if groups > 1 and (Co // groups) % bco:
        raise ValueError("grouped conv needs Co/groups % block_co == 0")
    cob_per_g = (Co + pad_co) // groups // bco if groups > 1 else \
        (Co + pad_co) // bco
    # pad W to the sublane tile (16) so the kernel's flat view and row
    # shifts are layout no-ops (see the kernel comment); padded columns
    # only feed wraparound outputs the final crop discards
    pad_w = (-W) % 16
    # pad input rows so (a) output row-blocks tile evenly and (b) the last
    # block's flat window (bh + dh·(kh-1) + 1 rows) stays in bounds
    pad_h = (-Hout) % bh + (1 if kw > 1 else 0)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    W = x.shape[2]
    Hpad = x.shape[1]
    n_hb = (Hout + (-Hout) % bh) // bh
    grid = (N, n_hb, (Co + pad_co) // bco)

    out = pl.pallas_call(
        functools.partial(
            _conv2d_nhwc_kernel, kh=kh, kw=kw, dh=dh, dw=dw, bh=bh
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N, n_hb * bh, W, Co + pad_co), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hpad, W, Cik),
                         lambda n, i, c: (n, 0, 0, c // cob_per_g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, Cik, bco), lambda n, i, c: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, W, bco),
                               lambda n, i, c: (n, i, 0, c),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Hout * W * Cik * (Co + pad_co) * kh * kw,
            bytes_accessed=(N * Hpad * W * Ci + N * Hout * W * Co)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w)
    return out[:, :Hout, :Wout, :Co]


def conv2d_direct_nhwc(x, w, dilation=(1, 1), stride=(1, 1), *,
                       groups: int = 1,
                       block_h: int = 0, block_co: int = 256,
                       interpret: bool = False):
    """x (N, H, W, Ci) ⊛ w (kh, kw, Ci, Co), VALID → NHWC out.

    Stride 1 runs the direct kernel; stride s decomposes into s·s phase
    convolutions on the same kernel (the phase split is one strided
    gather of x — O(input) traffic, amortised over kh·kw/s² taps each)."""
    sh, sw = stride
    if groups > 1:
        bco = min(block_co, w.shape[3] // groups)
        while (w.shape[3] // groups) % bco:
            bco -= 1
        block_co = bco
    if (sh, sw) == (1, 1):
        return _conv2d_s1_nhwc(x, w, dilation, groups=groups,
                               block_h=block_h,
                               block_co=block_co, interpret=interpret)
    if dilation != (1, 1):
        raise ValueError("strided Pallas conv supports dilation 1 only")
    N, H, W, Ci = x.shape
    kh, kw, _, Co = w.shape
    Hout = (H - kh) // sh + 1
    Wout = (W - kw) // sw + 1
    outs = []
    for pi in range(min(sh, kh)):
        for pj in range(min(sw, kw)):
            wp = w[pi::sh, pj::sw]              # (ceil((kh-pi)/sh), …)
            khp, kwp = wp.shape[0], wp.shape[1]
            # phase rows pi, pi+sh, … must cover r + a for r < Hout,
            # a < khp  →  exactly (Hout - 1 + khp) phase rows (pad with
            # zeros when the tail phase runs short; extra rows only feed
            # outputs the crop below discards)
            xp = x[:, pi::sh, pj::sw, :]
            nh, nw = Hout - 1 + khp, Wout - 1 + kwp
            if xp.shape[1] < nh or xp.shape[2] < nw:
                xp = jnp.pad(xp, ((0, 0), (0, max(0, nh - xp.shape[1])),
                                  (0, max(0, nw - xp.shape[2])), (0, 0)))
            xp = xp[:, :nh, :nw, :]
            o = _conv2d_s1_nhwc(xp, wp, (1, 1), groups=groups,
                                block_h=block_h,
                                block_co=block_co, interpret=interpret)
            outs.append(o[:, :Hout, :Wout, :])
    # one fused n-way add (separate `out += o` adds paid 3 extra output
    # read+write passes at stride 2 — measured ~20% of the s2 path)
    return functools.reduce(jnp.add, outs) if len(outs) > 1 else outs[0]


# Measured route table (tools/sweep_r4_conv.py, TPU v5e, r4 artifact;
# two-length chain timing, tanh loss for the backward — see docs/PERF.md).
# MFU pairs are (pallas, xla); "—" = pallas failed to compile (VMEM).
#
#   shape (NHWC, k3 unless noted)      fwd            fwd+bwd
#   64·112²·64→64                      0.10 / 0.21    — / 0.32
#   64·56²·256→256                     0.70 / 0.88    0.61* / 0.99
#   64·28²·512→512                     0.78 / 0.98    0.65 / 0.98
#   64·14²·1024→1024                   0.72 / 0.99    0.39 / 0.99
#   64·56²·256→512 s2                  0.32 / ~0.97   0.55 / 0.97
#   64·112²·64→128 s2                  0.06 / ~0.46   0.13 / 0.46
#   64·56²·256→512 k1                  0.47 / ~0.85   0.28 / 0.85
#   (* r3 artifact; the r4 re-run hit the dw VMEM guard, since fixed)
#
# At B=64, XLA's conv emitter wins EVERY measured configuration — it
# reaches implicit-GEMM tilings the tap-matmul scheme cannot (each tap
# here is a (bh·W, Ci)×(Ci, co) dot that re-reads the window kh·kw times
# from VMEM, and strided shapes quarter the tile sizes via phase
# decomposition).
#
# SMALL BATCH is the direct kernel's regime (r5 probe, stride-1 k3 fwd,
# same two-length chain timing — XLA's emitter tile-quantizes on the
# thin batch while the tap matmul flattens (B·bh·W, Ci) rows):
#
#   shape (NHWC fwd)                   pallas         xla
#   4·28²·512→512                      0.8093         0.6884
#   2·28²·512→512                      0.7637         0.6237
#   1·28²·512→512                      0.7120         0.5819
#   4·56²·256→256                      0.7956         0.6841
#   2·56²·256→256                      0.7866         0.7189
#   4·112²·64→64                       0.1815         0.1366
#   8·28²·512→512                      0.8039         0.9769   <- xla
#
# conv1d has the SAME regime (r5, tools/probe_conv1d_r5.py, k3
# C256→256 L3136 bf16; "NCW" = the framework-realistic path paying
# both layout transposes):
#
#   batch    pallas NWC   pallas NCW   xla NCH
#   1        0.6585       0.7911       0.4668
#   2        0.7274       0.7055       0.4879
#   4        0.7715       0.7061       0.4418
#   8        0.7852       0.7536       0.9011   <- xla
#   64       0.4623       —            0.7005   <- xla
#
# (The same probe killed the stacked-taps deep-K hypothesis: building
# the (bl, k·Ci) patch in VMEM and issuing ONE K=k·Ci dot measures
# 0.4571 vs 0.4623 for the k shallow dots at B64 bl784 — the shallow
# dots were never the bottleneck. Three Mosaic lowering gaps shaped
# the construction before it even ran; see _conv1d_kernel.)
#
# The crossover sits between B=4 (pallas +18%) and B=8 (xla +21%).
# Gradients keep XLA either way: the framework's conv VJP transposes the
# lax conv (ops/functional.py::_conv_vjp), so a pallas forward composes
# with the XLA backward — mixed fwd+bwd at B4 computes ~0.78 effective
# vs 0.74 pure-XLA; differentiating THROUGH the direct kernel (the
# composition backward below) measured 0.52 and stays off the route.
ROUTE_SWEEP = "tools/sweep_r4_conv.py + r5 small-batch probe"


def route_conv2d(nd: int, stride, dilation, groups: int,
                 training: bool = True, batch: int = 0,
                 ksize: int = 0, sample_bytes: int = 0,
                 weight_bytes: int = 0) -> str:
    """Per-shape tier choice for the direct conv kernels: "pallas" or
    "xla" (VERDICT r3 #2c: `config.use_pallas=True` must NEVER pessimise).

    The measured tables above pick the tier: the direct tap-matmul
    kernels win stride-1 unit-dilation ungrouped k3 forwards at
    batch <= 4, both 2-d (+10-22%) and 1-d (+45-75%); XLA wins
    everything else — large batch, strided/dilated/grouped shapes,
    conv3d, and all backwards. The pallas branch additionally requires the kernel's VMEM
    residents to fit: `sample_bytes` (one padded sample row-block,
    (H+2)·W·Ci·itemsize — the kernel holds it whole at the probed sizes)
    up to ~2 MB and `weight_bytes` up to ~6 MB, the envelope of the
    probed winners (a 224²x256 f32 sample is 52 MB and fails Mosaic's
    16M scoped-VMEM stack — auto must never turn a working XLA conv into
    a compile error). Callers that don't pass sizes get XLA. Force the
    direct kernels with `config.pallas_conv_route = "force"` (tests, and
    the measurement sweeps themselves, do)."""
    from ...config import config, on_tpu  # this file sits in ops/pallas/

    if config.pallas_conv_route == "force":
        return "pallas"
    if (nd == 2 and 0 < batch <= 4 and groups == 1
            and tuple(stride) == (1, 1) and tuple(dilation) == (1, 1)
            and ksize == 3
            and 0 < sample_bytes <= 2e6 and 0 < weight_bytes <= 6e6
            and on_tpu()):
        # the small-batch win is a TPU measurement (and compiled Pallas
        # needs the TPU backend anyway — CPU runs stay on XLA)
        return "pallas"
    if (nd == 1 and 0 < batch <= 4 and groups == 1
            and tuple(stride) == (1,) and tuple(dilation) == (1,)
            and ksize == 3
            and 0 < sample_bytes <= 2e6 and 0 < weight_bytes <= 6e6
            and on_tpu()):
        # conv1d has the same thin-batch regime (r5 probe, k3 C256
        # L3136 bf16): the NCW framework path — both transposes paid —
        # measures 0.71-0.79 vs XLA's 0.44-0.49 at B1-B4 (+45-75%);
        # XLA flips ahead at B8 (0.90 vs 0.75). Same VMEM envelope
        # caps as the 2-d branch (the 1-d kernel holds the whole
        # padded (L, Ci) sample per program).
        return "pallas"
    return "xla"


def conv2d_direct(x, w, dilation=(1, 1), stride=(1, 1), *, groups: int = 1,
                  block_h: int = 0, interpret: bool = False):
    """NCHW façade over the NHWC kernel: x (N, Ci, H, W) ⊛
    w (Co, Ci/groups, kh, kw) → (N, Co, Hout, Wout), VALID."""
    xt = x.transpose(0, 2, 3, 1)
    wt = w.transpose(2, 3, 1, 0)
    out = conv2d_direct_nhwc(xt, wt, dilation, stride, groups=groups,
                             block_h=block_h, interpret=interpret)
    return out.transpose(0, 3, 1, 2)


# --------------------------------------------------------------------------
# backward on the Pallas tier, by kernel composition (stride 1)


def _dw_kernel(x_ref, g_ref, o_ref, *, kh, kw, dh, dw, ho):
    # d(kernel) as an accumulating GEMM: grid (CiB, CoB, N), revisiting
    # the (kh, kw, bci, bco) output block across n; per program and
    # STATICALLY-unrolled tap:
    # dw[i, j] += Xflat[i·dh·W + j·dw :][:ho·W].T @ Gflat  — g is padded
    # to full width W with ZEROS in the cropped columns, which also kills
    # the flat-window wraparound terms (they multiply g's zero columns).
    # (Static taps because Mosaic has no dynamic_slice on loaded values;
    # channel blocking keeps the per-program footprint under the 16M
    # scoped-VMEM limit at production shapes.)
    ci = x_ref.shape[3]
    co = g_ref.shape[3]
    W = x_ref.shape[2]
    n = pl.program_id(2)

    xflat = x_ref[0].reshape(x_ref.shape[1] * W, ci)
    gflat = g_ref[0].reshape(ho * W, co)
    for i in range(kh):
        for j in range(kw):
            off = i * dh * W + j * dw
            part = jax.lax.dot_general(
                xflat[off:off + ho * W, :], gflat,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(n == 0)
            def _init(part=part, i=i, j=j):
                o_ref[i, j] = part

            @pl.when(n != 0)
            def _acc(part=part, i=i, j=j):
                o_ref[i, j] += part


@functools.partial(
    jax.jit, static_argnames=("kh", "kw", "dilation", "block_ci", "block_co",
                              "interpret")
)
def conv2d_dw_nhwc(x, g, kh: int, kw: int, dilation=(1, 1), *,
                   block_ci: int = 128, block_co: int = 128,
                   interpret: bool = False):
    """d(kernel) for the stride-1 VALID NHWC conv: correlate input with the
    out-gradient, contracting batch and space on the MXU.
    x (N, H, W, Ci), g (N, Ho, Wo, Co) → (kh, kw, Ci, Co) f32."""
    N, H, W, Ci = x.shape
    _, Ho, Wo, Co = g.shape
    dh, dw = dilation
    # pad W to the sublane tile so the flat views are layout no-ops, and
    # zero-pad g to full width: flat-slice wraparound terms hit zeros
    Wp = W + (-W) % 16
    if Wo != Wp:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, Wp - Wo), (0, 0)))
    need = (Ho - 1) + dh * (kh - 1) + 1 + (1 if kw > 1 else 0)
    if H < need or W != Wp:
        x = jnp.pad(x, ((0, 0), (0, max(0, need - H)), (0, Wp - W), (0, 0)))
    W = Wp

    # default 128-channel blocks: 256 quarters the batch-revisit count but
    # blows the 16M scoped-VMEM stack at ResNet mid-stage shapes (measured
    # r4: 19.6M at 56²x256 — double-buffered inputs plus dot temps roughly
    # triple the naive block-footprint estimate), and where it does fit
    # (28²x512) it measured no faster; keep 128 unless a caller opts in
    bci = min(block_ci, Ci)
    bco = min(block_co, Co)
    while 3 * (x.shape[1] * W * bci + Ho * W * bco) * x.dtype.itemsize \
            + kh * kw * bci * bco * 4 > 14e6 and bci > 128:
        bci //= 2
        bco //= 2
    pci, pco = (-Ci) % bci, (-Co) % bco
    if pci:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pci)))
    if pco:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, pco)))
    out = pl.pallas_call(
        functools.partial(_dw_kernel, kh=kh, kw=kw, dh=dh, dw=dw, ho=Ho),
        out_shape=jax.ShapeDtypeStruct(
            (kh, kw, Ci + pci, Co + pco), jnp.float32),
        grid=((Ci + pci) // bci, (Co + pco) // bco, N),
        in_specs=[
            pl.BlockSpec((1, x.shape[1], W, bci),
                         lambda a, b, n: (n, 0, 0, a),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, W, bco), lambda a, b, n: (n, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kh, kw, bci, bco),
                               lambda a, b, n: (0, 0, a, b),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Ho * W * Ci * Co * kh * kw,
            bytes_accessed=(N * H * W * Ci + N * Ho * W * Co
                            + kh * kw * Ci * Co) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, g)
    return out[:, :, :Ci, :Co]


def conv2d_direct_input_grad(g, w, dilation=(1, 1), *, interpret=False):
    """d(input) for stride-1 VALID conv (NCHW API): full-correlation with
    the spatially flipped, io-swapped kernel."""
    dh, dw_ = dilation
    kh, kw = w.shape[2], w.shape[3]
    gpad = jnp.pad(
        g, ((0, 0), (0, 0), (dh * (kh - 1),) * 2, (dw_ * (kw - 1),) * 2)
    )
    w_t = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # (Ci, Co, kh, kw)
    return conv2d_direct(gpad, w_t, dilation, interpret=interpret)


def conv2d_direct_kernel_grad(x, g, *, interpret=False):
    """d(kernel) for stride-1, dilation-1 VALID conv (NCHW API), on the
    accumulating dw GEMM kernel."""
    kh = x.shape[2] - g.shape[2] + 1
    kw = x.shape[3] - g.shape[3] + 1
    dw = conv2d_dw_nhwc(
        x.transpose(0, 2, 3, 1), g.transpose(0, 2, 3, 1), kh, kw,
        interpret=interpret,
    )  # (kh, kw, Ci, Co)
    return dw.transpose(3, 2, 0, 1).astype(x.dtype)  # (Co, Ci, kh, kw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_pallas(x, w, dilation=(1, 1), interpret: bool = False):
    """Stride-1 VALID Conv2d (NCHW) where forward AND both backward passes
    run on the direct Pallas kernels (other configurations use the XLA
    path in ops.functional)."""
    return conv2d_direct(x, w, dilation, interpret=interpret)


def _conv2d_pallas_fwd(x, w, dilation, interpret):
    return conv2d_direct(x, w, dilation, interpret=interpret), (x, w)


def _conv2d_pallas_bwd(dilation, interpret, res, g):
    x, w = res
    dx = conv2d_direct_input_grad(g, w, dilation, interpret=interpret)
    if dilation == (1, 1):
        dw = conv2d_direct_kernel_grad(x, g, interpret=interpret)
    else:
        # dilated kernel-grad needs strided output sampling — use the XLA
        # conv's transpose (same math as ops.functional's conv vjp)
        from ..functional import _conv_fwd

        dw = jax.linear_transpose(
            lambda k: _conv_fwd(((1, 1), dilation, 1), k, x), w
        )(g)[0]
    return dx, dw


conv2d_pallas.defvjp(_conv2d_pallas_fwd, _conv2d_pallas_bwd)


# --------------------------------------------------------------------------
# NHWC custom-VJP entry (the models/resnet.py path)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv2d_pallas_nhwc(x, w, stride=(1, 1), padding="SAME",
                       interpret: bool = False):
    """NHWC ⊛ HWIO conv on the Pallas tier, SAME or VALID, stride 1 or 2 —
    the layouts models/resnet.py already uses, so no boundary transposes.
    Forward runs the direct kernel (phase-decomposed when strided);
    stride-1 backward stays on the Pallas tier (dx on the forward kernel,
    dw on the accumulating GEMM kernel); strided backward falls back to
    the XLA transpose."""
    return _nhwc_fwd_impl(x, w, stride, padding, interpret)


def _same_pads(size, k, s):
    # lax/TF SAME: out = ceil(size / s); pad split low-first
    out = -(-size // s)
    pad = max((out - 1) * s + k - size, 0)
    lo = pad // 2
    return lo, pad - lo


def _nhwc_fwd_impl(x, w, stride, padding, interpret):
    kh, kw = w.shape[0], w.shape[1]
    if padding == "SAME":
        ph = _same_pads(x.shape[1], kh, stride[0])
        pw = _same_pads(x.shape[2], kw, stride[1])
        x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    elif padding != "VALID":
        raise ValueError(f"unknown padding {padding!r}")
    return conv2d_direct_nhwc(x, w, (1, 1), stride, interpret=interpret)


def _nhwc_fwd(x, w, stride, padding, interpret):
    return _nhwc_fwd_impl(x, w, stride, padding, interpret), (x, w)


def _nhwc_bwd(stride, padding, interpret, res, g):
    x, w = res
    kh, kw, _, _ = w.shape
    if padding == "SAME":
        ph = _same_pads(x.shape[1], kh, stride[0])
        pw = _same_pads(x.shape[2], kw, stride[1])
    else:
        ph = pw = (0, 0)
    if stride == (1, 1):
        # dx: full-correlate g with the flipped, io-swapped kernel on the
        # SAME forward kernel, then crop the padding border
        gpad = jnp.pad(g, ((0, 0), (kh - 1,) * 2, (kw - 1,) * 2, (0, 0)))
        w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        dx_full = conv2d_direct_nhwc(gpad, w_t, interpret=interpret)
        dx = dx_full[:, ph[0]:dx_full.shape[1] - ph[1],
                     pw[0]:dx_full.shape[2] - pw[1], :]
        xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
        dw = conv2d_dw_nhwc(xp, g, kh, kw, interpret=interpret).astype(
            w.dtype)
        return dx, dw
    # strided: XLA transpose of the equivalent lax conv
    from jax import lax

    def f(x_, w_):
        return lax.conv_general_dilated(
            x_, w_, stride, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dx = jax.linear_transpose(lambda x_: f(x_, w), x)(g)[0]
    dw = jax.linear_transpose(lambda w_: f(x, w_), w)(g)[0]
    return dx, dw


conv2d_pallas_nhwc.defvjp(_nhwc_fwd, _nhwc_bwd)


# --------------------------------------------------------------------------
# rank-generic direct convs: 1-d and 3-d on the same flat-window scheme
# (SURVEY.md §7 "Pallas tier": im2col-free direct conv kernels for 1/2/3-d.
# The flat-window wraparound argument composes across spatial dims — taps
# along any dim only contaminate positions the VALID crop discards.)


def _conv1d_kernel(x_ref, w_ref, o_ref, *scratch, k, d, bl,
                   out_ncw=False, stack_taps=False):
    # x_ref (1, Lpad, Ci) full sample; w_ref (k, Ci, co_b);
    # o_ref (1, bl, co_b) — or (1, co_b, bl) when out_ncw (the block
    # transposes in VMEM). MEASURED WORSE on v5e: 0.32 MFU vs 0.61 for
    # kernel + XLA output transpose at B64 C256 L3136 — Mosaic lowers
    # acc.T as an accumulator relayout that dwarfs the HBM transpose it
    # saves, and the NCW block's %128 last-dim rule pads bl 784 → 896.
    # Kept as a measured-dead-end record; the framework path does NOT
    # set it (ops/functional._conv_fwd).
    # Tap j is the static row slice window[j·d : j·d + bl] — 1-d
    # windows are natively contiguous, so unlike the 2-d kernel there
    # is no wraparound and no W padding.
    ci = x_ref.shape[2]
    co = o_ref.shape[1] if out_ncw else o_ref.shape[2]
    span = bl + d * (k - 1)
    if x_ref.shape[1] == span:
        window = x_ref[0]
    else:
        qi = pl.program_id(1)
        window = x_ref[0, pl.ds(pl.multiple_of(qi * bl, bl), span), :]
    if stack_taps:
        # im2col IN VMEM: build the (bl, k·Ci) patch in a scratch
        # buffer and issue ONE dot with K = k·Ci — the deep-K GEMM
        # regime (bench matmul measures 0.925 at K=768) instead of k
        # shallow K=Ci passes; the patch never touches HBM. The
        # scratch store is the only construction Mosaic lowers for
        # bf16: a vector lane-concat of the shifted tap views refuses
        # mismatched sublane offsets on the non-concat dim, dynamic
        # ref loads must be 8-aligned on the sublane dim, and
        # pltpu.roll (tpu.dynamic_rotate) is unimplemented for
        # non-32-bit data — storing each shifted view relayouts it
        # through VMEM instead. The weight reshape (k, Ci, co) →
        # (k·Ci, co) is a row-major view, j-major — matching the
        # scratch's column order.
        p_ref = scratch[0]
        for j in range(k):
            p_ref[:, j * ci:(j + 1) * ci] = window[j * d:j * d + bl, :]
        acc = jnp.dot(p_ref[...], w_ref[...].reshape(k * ci, co),
                      preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((bl, co), jnp.float32)
        for j in range(k):
            acc = acc + jnp.dot(window[j * d:j * d + bl, :], w_ref[j],
                                preferred_element_type=jnp.float32)
    if out_ncw:
        o_ref[0] = acc.T.astype(o_ref.dtype)
    else:
        o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "block_l", "block_co", "out_ncw",
                     "stack_taps", "interpret"),
)
def _conv1d_s1_nwc(x, w, dilation=1, *, block_l: int = 0,
                   block_co: int = 256, out_ncw: bool = False,
                   stack_taps: bool = False, interpret: bool = False):
    """x (N, L, Ci) ⊛ w (k, Ci, Co), stride 1, VALID → (N, Lout, Co) —
    a native 1-d flat-window kernel (the r3 (1, L)-image lowering onto
    the 2-d kernel forced one whole-L row block per sample and measured
    0.38 MFU; dedicated L-blocking restores a real grid)."""
    N, L, Ci = x.shape
    k, Cik, Co = w.shape
    if Cik != Ci:
        raise ValueError("channel mismatch (grouped conv1d: use XLA)")
    d = dilation
    Lout = L - d * (k - 1)
    if Lout <= 0:
        raise ValueError("kernel larger than input")
    if block_l <= 0:
        # auto: ~768-row blocks that tile Lout with minimal padding —
        # at B64 C256 L3136 the fixed 512 pads 3136 -> 7x512 and
        # measures 0.30 MFU on v5e while the even 4x784 split measures
        # 0.61 (XLA's conv emitter still leads at 0.70, so the route
        # table keeps conv1d on XLA; this kernel is the measured
        # runner-up, kept for force mode). Shrink when wide channel
        # counts would pinch VMEM (window + acc, ~6 bytes per element
        # with double buffering).
        n_b = max(1, round(Lout / 768) or 1)
        block_l = -(-Lout // n_b)
        while block_l * max(Ci, 256) * 6 > 4e6 and block_l > 128:
            block_l = -(-block_l // 2)
    block_l = -(-block_l // 8) * 8       # Mosaic sublane rule for NWC
    bl = min(block_l, Lout)
    if out_ncw:
        # the NCW output block's LAST dim is bl → Mosaic requires a
        # multiple of 128 (NWC only needed bl % 8 on the sublane dim)
        bl = -(-bl // 128) * 128
    bco = min(block_co, Co)
    pad_co = (-Co) % bco
    if pad_co:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_co)))
    # pad L so (a) output blocks tile evenly and (b) the last block's
    # span (bl + d·(k-1)) stays in bounds
    n_lb = -(-Lout // bl)
    need = (n_lb - 1) * bl + bl + d * (k - 1)
    if L < need:
        x = jnp.pad(x, ((0, 0), (0, need - L), (0, 0)))
    grid = (N, n_lb, (Co + pad_co) // bco)
    if out_ncw:
        out_shape = jax.ShapeDtypeStruct((N, Co + pad_co, n_lb * bl),
                                         x.dtype)
        out_spec = pl.BlockSpec((1, bco, bl), lambda n, i, c: (n, c, i),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((N, n_lb * bl, Co + pad_co),
                                         x.dtype)
        out_spec = pl.BlockSpec((1, bl, bco), lambda n, i, c: (n, i, c),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_conv1d_kernel, k=k, d=d, bl=bl,
                          out_ncw=out_ncw, stack_taps=stack_taps),
        out_shape=out_shape,
        grid=grid,
        scratch_shapes=([pltpu.VMEM((bl, k * Ci), x.dtype)]
                        if stack_taps else []),
        in_specs=[
            pl.BlockSpec((1, x.shape[1], Ci), lambda n, i, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, Ci, bco), lambda n, i, c: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Lout * Ci * (Co + pad_co) * k,
            bytes_accessed=(N * L * Ci + N * Lout * Co) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w)
    if out_ncw:
        return out[:, :Co, :Lout]
    return out[:, :Lout, :Co]


def conv1d_direct_nwc(x, w, dilation=1, stride=1, *, out_ncw=False,
                      interpret=False):
    """x (N, L, Ci) ⊛ w (k, Ci, Co), VALID → (N, Lout, Co) — or
    (N, Co, Lout) when ``out_ncw`` (the stride-1 kernel transposes its
    block in VMEM, sparing NCW callers the HBM output transpose).

    Stride 1 runs the native 1-d kernel; strided convs lower onto the
    2-d kernel as a (1, L) image with (1, k) taps (phase decomposition
    there handles the stride)."""
    if stride == 1:
        return _conv1d_s1_nwc(x, w, dilation, out_ncw=out_ncw,
                              interpret=interpret)
    a = conv2d_direct_nhwc(
        x[:, None], w[None], (1, dilation), (1, stride),
        interpret=interpret,
    )[:, 0]
    return a.transpose(0, 2, 1) if out_ncw else a


def _conv3d_kernel(x_ref, w_ref, o_ref, *, kd, kh, kw, dd, dh, dw, bd):
    # x_ref (1, Dpad, H, W, Ci); w_ref (kd, kh, kw, Ci, co_b);
    # o_ref (1, bd, H, W, co_b) — FULL H and W (caller crops the last
    # dh·(kh-1) rows and dw·(kw-1) cols: flat-window wraparound).
    ci = x_ref.shape[4]
    co = o_ref.shape[4]
    H, W = x_ref.shape[2], x_ref.shape[3]
    span = bd + dd * (kd - 1)
    rows = span + (1 if (kh > 1 or kw > 1) else 0)

    if x_ref.shape[1] == rows:
        window = x_ref[0].reshape(rows * H * W, ci)
    else:
        qi = pl.program_id(1)
        d0 = pl.multiple_of(qi * bd, bd)
        window = x_ref[0, pl.ds(d0, rows), :, :, :].reshape(
            rows * H * W, ci)
    # pre-shift once per (j, l) in-plane tap (kh·kw copies); the kd depth
    # offsets below are then aligned H·W-stride views
    shifted = {}
    for j in range(kh):
        for l in range(kw):
            off = j * dh * W + l * dw
            shifted[(j, l)] = window[off:off + span * H * W, :]
    acc = jnp.zeros((bd * H * W, co), jnp.float32)
    for i in range(kd):
        for j in range(kh):
            for l in range(kw):
                flat = shifted[(j, l)][
                    i * dd * H * W:i * dd * H * W + bd * H * W, :]
                acc = acc + jnp.dot(flat, w_ref[i, j, l],
                                    preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bd, H, W, co).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dilation", "block_d", "block_co", "interpret")
)
def conv3d_direct_ndhwc(x, w, dilation=(1, 1, 1), *, block_d: int = 0,
                        block_co: int = 256, interpret: bool = False):
    """x (N, D, H, W, Ci) ⊛ w (kd, kh, kw, Ci, Co), stride 1, VALID →
    NDHWC out. Same flat-window scheme as 2-d, one rank up: the window
    flattens (depth, rows, cols) and each tap is one MXU dot."""
    N, D, H, W, Ci = x.shape
    kd, kh, kw, Ci2, Co = w.shape
    if Ci != Ci2:
        raise ValueError("channel mismatch (groups != 1 not supported here)")
    dd, dh, dw = dilation
    Dout = D - dd * (kd - 1)
    Hout = H - dh * (kh - 1)
    Wout = W - dw * (kw - 1)
    if min(Dout, Hout, Wout) <= 0:
        raise ValueError("kernel larger than input")

    if block_d <= 0:
        n_b = max(1, -(-Dout // 8))
        block_d = -(-Dout // n_b)
        while block_d * (H + 1) * (W + 16) * max(Ci, 128) * 6 > 8e6 \
                and block_d > 1:
            block_d = -(-block_d // 2)
    bd = min(block_d, Dout)
    bco = min(block_co, Co)
    pad_co = (-Co) % bco
    if pad_co:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad_co)))
    pad_w = (-W) % 16
    pad_d = (-Dout) % bd + (1 if (kh > 1 or kw > 1) else 0)
    if pad_d or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_d), (0, 0), (0, pad_w), (0, 0)))
    W = x.shape[3]
    Dpad = x.shape[1]
    n_db = (Dout + (-Dout) % bd) // bd
    grid = (N, n_db, (Co + pad_co) // bco)

    out = pl.pallas_call(
        functools.partial(_conv3d_kernel, kd=kd, kh=kh, kw=kw,
                          dd=dd, dh=dh, dw=dw, bd=bd),
        out_shape=jax.ShapeDtypeStruct(
            (N, n_db * bd, H, W, Co + pad_co), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Dpad, H, W, Ci),
                         lambda n, i, c: (n, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kd, kh, kw, Ci, bco),
                         lambda n, i, c: (0, 0, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bd, H, W, bco),
                               lambda n, i, c: (n, i, 0, 0, c),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Dout * H * W * Ci * (Co + pad_co) * kd * kh * kw,
            bytes_accessed=(N * Dpad * H * W * Ci
                            + N * Dout * H * W * Co) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w)
    return out[:, :Dout, :Hout, :Wout, :Co]
