"""2-D convolution with exact scipy.signal.convolve ``valid|same|full`` semantics.

The reference routes every hot convolution through ``scipy.signal.convolve``
(FFT under the hood — ref lib/deconvolution.pyx:13,478,491,558,571) and keeps
a ``fft_slice`` helper for cropping FFT output (ref lib/deconvolution.pyx:102-126).
Here the same semantics are provided by three XLA-native backends:

* ``stencil`` — shift-and-add over the kernel taps; XLA fuses the whole tap
  sum into one VPU pass over VMEM tiles.  Fastest for small PSFs (float32
  throughout, so it is also the exact-parity path).
* ``direct`` — ``lax.conv_general_dilated`` (correlation) with the kernel
  flipped and per-mode asymmetric padding, grouped over RGB channels.
  Mid-size kernels, where the stencil unroll gets compile-heavy.
* ``fft``    — rfft2/irfft2 at full linear-convolution size (optionally padded
  to the next 2/3/5-smooth length for TPU FFT speed), then cropped with the
  same centering rule scipy uses (offset = floor((full - out)/2)).  Large
  kernels (e.g. the whiteness-metric autocorrelation where the kernel is the
  size of the image patch).

``method='auto'`` picks per call by tap count.  Everything is shape-static
and jit-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["convolve2d", "convolve_rgb", "fft_autocorrelate_same"]

# Backend selection thresholds (measured on v5e, 25 MP images, f32):
# shift-and-add stencil ~3-6 ms (one fused VPU pass, cost linear in taps),
# grouped lax.conv ~90 ms, FFT ~386 ms but flat in kernel size.  Stencil
# compile cost grows with taps (one HLO slice+fma per tap), so cap it.
_STENCIL_THRESHOLD_TAPS = 13 * 13
_FFT_THRESHOLD_TAPS = 31 * 31
_MXU_THRESHOLD_TAPS = 9 * 9  # TPU-only pallas/mxu tier; see _dispatch


def _pallas_tile_h(a3, mk: int, budget: int = 13 * 2**20) -> int | None:
    """Largest row-tile whose band scratch PLUS output blocks fit the
    16 MB scoped-VMEM budget (with headroom), or None if none does.

    The output block counts TWICE: Pallas double-buffers out blocks to
    overlap the grid-step output copy with compute.  (Under-counting this
    made 24 MP frames exceed the scoped-vmem limit by 450 KB at tile 128 —
    a compile-time OOM on real v5e.)  The kernel's fori_loop carry adds a
    rolled single-channel band copy plus the tile-sized accumulator."""
    c, _, w = a3.shape
    w_pad = -(-w // 128) * 128
    item = a3.dtype.itemsize
    for tile_h in (128, 64, 32):
        band_rows = tile_h + (-(-(mk - 1) // 8) * 8)
        need = c * w_pad * item * (band_rows + 2 * tile_h) + 2 * w_pad * item * (
            band_rows + tile_h
        )
        if need < budget:
            return tile_h
    return None


def _out_shape(m: int, mk: int, mode: str) -> int:
    if mode == "valid":
        return m - mk + 1
    if mode == "same":
        return m
    if mode == "full":
        return m + mk - 1
    raise ValueError(f"unknown mode {mode!r}")


def _pads(mk: int, mode: str) -> tuple[int, int]:
    """Per-axis (lo, hi) padding so that correlation-with-flipped-kernel at
    this padding equals the scipy convolution slice for ``mode``.

    Derivation: with kernel flipped, out[i] = full[i + (mk-1) - lo].
    full  → offset 0            → lo = hi = mk-1
    same  → offset (mk-1)//2    → lo = ceil((mk-1)/2), hi = (mk-1)//2
    valid → offset mk-1         → lo = hi = 0
    """
    if mode == "valid":
        return (0, 0)
    if mode == "full":
        return (mk - 1, mk - 1)
    if mode == "same":
        off = (mk - 1) // 2
        return (mk - 1 - off, off)
    raise ValueError(f"unknown mode {mode!r}")


@functools.lru_cache(maxsize=None)
def _next_fast_len(n: int) -> int:
    """Smallest 2/3/5-smooth integer >= n (TPU FFT is fastest at these)."""
    if n <= 2:
        return n
    best = 1 << (n - 1).bit_length()  # next power of two is an upper bound
    p5 = 1
    while p5 < best:
        p53 = p5
        while p53 < best:
            # round p53 up by powers of two
            rem = -(-n // p53)  # ceil(n / p53)
            p2 = 1 << max(0, (rem - 1).bit_length())
            cand = p53 * p2
            if n <= cand < best:
                best = cand
            p53 *= 3
        p5 *= 5
    return best


def _conv_direct(a: jax.Array, k: jax.Array, mode: str, precision) -> jax.Array:
    """Batched grouped 2-D convolution. a: (C,H,W); k: (C,MK,NK)."""
    c, _, _ = a.shape
    _, mk, nk = k.shape
    lhs = a[jnp.newaxis]  # (1, C, H, W)
    rhs = jnp.flip(k, axis=(1, 2))[:, jnp.newaxis]  # (C, 1, MK, NK)
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding=(_pads(mk, mode), _pads(nk, mode)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=precision,
    )
    return out[0]


def _conv_stencil(a: jax.Array, k: jax.Array, mode: str) -> jax.Array:
    """Shift-and-add convolution: out = sum_taps k[t] * shift(a).

    For small PSFs this is the fastest TPU path: XLA fuses the whole tap sum
    into ONE elementwise pass over VMEM tiles (two HBM passes total), where
    ``lax.conv`` with feature_group_count=C lowers to a poorly-utilized
    grouped conv.  a: (C, H, W); k: (C, MK, NK).
    """
    c, m, n = a.shape
    _, mk, nk = k.shape
    (plo, phi) = _pads(mk, mode)
    (qlo, qhi) = _pads(nk, mode)
    padded = jnp.pad(a, ((0, 0), (plo, phi), (qlo, qhi)))
    out_m = m + plo + phi - mk + 1
    out_n = n + qlo + qhi - nk + 1
    out = jnp.zeros((c, out_m, out_n), a.dtype)
    # convolution: out[i] = sum_t a[i + (mk-1-t) - lo] k[t]  (kernel flipped)
    for ti in range(mk):
        for tj in range(nk):
            patch = lax.slice(
                padded,
                (0, mk - 1 - ti, nk - 1 - tj),
                (c, mk - 1 - ti + out_m, nk - 1 - tj + out_n),
            )
            out = out + patch * k[:, ti : ti + 1, tj : tj + 1]
    return out


def _conv_fft(a: jax.Array, k: jax.Array, mode: str, fast_len: bool) -> jax.Array:
    """Batched FFT convolution. a: (C,H,W); k: (C,MK,NK).

    FFTs run in float32 regardless of input dtype (XLA RFFT supports only
    f32/f64); the result is cast back to the input dtype.
    """
    _, m, n = a.shape
    _, mk, nk = k.shape
    mf, nf = m + mk - 1, n + nk - 1
    sm = _next_fast_len(mf) if fast_len else mf
    sn = _next_fast_len(nf) if fast_len else nf
    fa = jnp.fft.rfft2(a.astype(jnp.float32), s=(sm, sn), axes=(-2, -1))
    fk = jnp.fft.rfft2(k.astype(jnp.float32), s=(sm, sn), axes=(-2, -1))
    full = jnp.fft.irfft2(fa * fk, s=(sm, sn), axes=(-2, -1))[..., :mf, :nf]
    ym = _out_shape(m, mk, mode)
    xn = _out_shape(n, nk, mode)
    oy = (mf - ym) // 2
    ox = (nf - xn) // 2
    return lax.slice(full, (0, oy, ox), (full.shape[0], oy + ym, ox + xn)).astype(
        a.dtype
    )


def _conv_mxu(a: jax.Array, k: jax.Array, mode: str, precision) -> jax.Array:
    """MXU-mapped convolution via block-banded batched matmuls.

    The per-channel stencil runs on the VPU (one FMA per tap per element,
    plus a lane rotation per tap — the large-frame cost ceiling).  Here the
    width splits into 128-lane blocks and the column taps become two
    128x128 banded mixing matrices per tap row: for output block j,

        out_blk[j] = in_blk[j] @ B0[t1] + in_blk[j+1] @ B1[t1]

    where ``B0[r, c] = kf[t1, r-c]`` (main band) and ``B1`` carries the
    taps that cross the block boundary.  Both operands are plain reshapes
    of contiguous rows — (C, H, nb, 128) views — so each tap row costs two
    MXU-shaped batched matmuls (M = H*nb, K = N = 128, batch = C) and no
    gather/space-to-depth transpose.  FLOPs inflate by 2*128/nk, which the
    MXU's ~25x throughput edge over the VPU more than covers for the PSF
    sizes this pipeline uses.  (An earlier grouped-``lax.conv``
    formulation of the same idea lowered poorly — 6.8 ms vs this one's
    sub-4 ms for a 9x9 bf16 conv at 6.3 MP on v5e.)

    a: (C, H, W); k: (C, MK, NK), NK <= 128.  Any ``mode``.
    """
    c, m, n = a.shape
    _, mk, nk = k.shape
    if nk > 128:
        return _conv_fft(a, k, mode, fast_len=True)
    B = 128
    (plo, phi) = _pads(mk, mode)
    (qlo, qhi) = _pads(nk, mode)
    padded = jnp.pad(a, ((0, 0), (plo, phi), (qlo, qhi)))
    out_m = m + plo + phi - mk + 1
    out_n = n + qlo + qhi - nk + 1
    nb = -(-out_n // B)  # output blocks
    # nb+1 blocks of input so the boundary-crossing matmul stays in bounds
    pad_right = (nb + 1) * B - padded.shape[2]
    x = jnp.pad(padded, ((0, 0), (0, 0), (0, max(pad_right, 0))))
    if pad_right < 0:
        x = x[:, :, : (nb + 1) * B]

    # banded mixing matrices per channel and tap row: (C, MK, 2, B, B)
    kf = jnp.flip(k, axis=(1, 2))  # true convolution
    r_idx = jnp.arange(B)
    t2 = r_idx[:, None] - r_idx[None, :]  # in-block tap offset r - c
    mix = []
    for s in range(2):
        dx = t2 + s * B
        valid = (dx >= 0) & (dx < nk)
        dxc = jnp.clip(dx, 0, nk - 1)
        mix.append(jnp.where(valid[None, None], kf[:, :, dxc], 0))
    mix0, mix1 = (mm.astype(a.dtype) for mm in mix)

    dn = (((3,), (1,)), ((0,), (0,)))  # contract lanes, batch channels
    acc = None
    for t1 in range(mk):
        rows = lax.slice(x, (0, t1, 0), (c, t1 + out_m, x.shape[2]))
        blk0 = rows[:, :, : nb * B].reshape(c, out_m, nb, B)
        blk1 = rows[:, :, B:].reshape(c, out_m, nb, B)
        term = lax.dot_general(
            blk0, mix0[:, t1], dn, precision=precision,
            preferred_element_type=jnp.float32,
        ) + lax.dot_general(
            blk1, mix1[:, t1], dn, precision=precision,
            preferred_element_type=jnp.float32,
        )
        acc = term if acc is None else acc + term
    out = acc.reshape(c, out_m, nb * B)[:, :, :out_n]
    return out.astype(a.dtype)


def _conv_pallas_vmappable(a3: jax.Array, k3: jax.Array, mode: str) -> jax.Array:
    """Banded-VMEM Pallas conv with a vmap fallback.

    Mosaic cannot lower the kernel's HBM input spec under a mapped batch
    axis, so a ``custom_vmap`` rule reroutes BATCHED calls to the fused XLA
    stencil (same math) while plain calls get the fast kernel.
    """
    from jax.custom_batching import custom_vmap

    from ics_tpu.ops.pallas_conv import _conv_planar

    tile_h = _pallas_tile_h(a3, k3.shape[1])
    if tile_h is None:
        # no row tile fits the scoped-VMEM budget (extremely wide frames):
        # same math on a portable backend instead of a guaranteed Mosaic
        # VMEM OOM at the end of a long compile.  Tap-count rule matches
        # the vmap rule below: the stencil unrolls one slice+fma HLO per
        # tap, so big explicit-'pallas' kernels go to the grouped conv.
        taps = k3.shape[-2] * k3.shape[-1]
        if taps <= _STENCIL_THRESHOLD_TAPS:
            return _conv_stencil(a3, k3, mode)
        return _conv_direct(a3, k3, mode, lax.Precision.HIGHEST)

    @custom_vmap
    def run(a, k):
        return _conv_planar(
            a, k, mode=mode, tile_h=tile_h,
            interpret=jax.default_backend() != "tpu",
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, a, k):  # noqa: ANN001
        ab, kb = in_batched
        # fused stencil for small kernels; the grouped-conv backend above
        # the stencil threshold (a vmapped 31x31 stencil would unroll 961
        # slice+fma HLO ops — the compile blowup the threshold exists to
        # prevent)
        taps = k.shape[-2] * k.shape[-1]
        if taps <= _STENCIL_THRESHOLD_TAPS:
            inner = lambda x, y: _conv_stencil(x, y, mode)
        else:
            inner = lambda x, y: _conv_direct(
                x, y, mode, lax.Precision.HIGHEST
            )
        out = jax.vmap(
            inner, in_axes=(0 if ab else None, 0 if kb else None)
        )(a, k)
        return out, True

    return run(a3, k3)


def _conv_pallas_mxu_vmappable(
    a3: jax.Array, k3: jax.Array, mode: str, precision
) -> jax.Array:
    """MXU banded-matmul Pallas conv with the same custom_vmap fallback
    contract as ``_conv_pallas_vmappable`` (Mosaic cannot lower the HBM
    spec under a mapped batch axis)."""
    from jax.custom_batching import custom_vmap

    from ics_tpu.ops.pallas_conv_mxu import _conv_planar_mxu, mxu_tile_h

    if k3.shape[2] > 129:
        # the kernel's 2x128-lane window covers 128 output lanes plus the
        # tap overhang, so nk > 129 would silently drop taps; auto never
        # routes such kernels here — reject explicit requests loudly
        raise ValueError(
            f"pallas_mxu supports kernel widths <= 129, got {k3.shape[2]}"
        )
    if precision == "bf16x3" and a3.dtype == jnp.float32:
        # f32 emulation by hi/lo bf16 split inside the kernel: 3 single-
        # pass MXU matmuls vs HIGHEST's 6, ~7e-6 rel error on hardware
        # (selftest-certified) — see pallas_conv_mxu._split_hi_lo
        precision_name = "bf16x3"
    else:
        precision_name = (
            "highest" if precision == lax.Precision.HIGHEST else "default"
        )
    tile_h = mxu_tile_h(
        a3.shape, a3.dtype.itemsize, k3.shape[1], k3.shape[2],
        split=precision_name == "bf16x3",
    )
    if tile_h is None:
        taps = k3.shape[-2] * k3.shape[-1]
        if taps <= _STENCIL_THRESHOLD_TAPS:
            return _conv_stencil(a3, k3, mode)
        return _conv_direct(a3, k3, mode, lax.Precision.HIGHEST)

    @custom_vmap
    def run(a, k):
        return _conv_planar_mxu(
            a, k, mode=mode, tile_h=tile_h,
            interpret=jax.default_backend() != "tpu",
            precision_name=precision_name,
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, a, k):  # noqa: ANN001
        ab, kb = in_batched
        taps = k.shape[-2] * k.shape[-1]
        if taps <= _STENCIL_THRESHOLD_TAPS:
            inner = lambda x, y: _conv_stencil(x, y, mode)
        else:
            inner = lambda x, y: _conv_direct(
                x, y, mode, lax.Precision.HIGHEST
            )
        out = jax.vmap(
            inner, in_axes=(0 if ab else None, 0 if kb else None)
        )(a, k)
        return out, True

    return run(a3, k3)


def _dispatch(a3: jax.Array, k3: jax.Array, mode: str, method: str, precision):
    _, mk, nk = k3.shape
    bf16x3 = precision == "bf16x3"
    if bf16x3:
        # the split applies only inside the MXU band kernel; every other
        # backend treats 'bf16x3' as exact f32 (HIGHEST)
        precision = lax.Precision.HIGHEST
    if method == "auto":
        taps = mk * nk
        on_tpu = jax.default_backend() == "tpu"
        if (
            bf16x3
            and on_tpu
            and a3.dtype == jnp.float32
            and _MXU_THRESHOLD_TAPS <= taps <= _FFT_THRESHOLD_TAPS
            and nk <= 129
        ):
            from ics_tpu.ops.pallas_conv_mxu import mxu_tile_h

            if mxu_tile_h(
                a3.shape, a3.dtype.itemsize, mk, nk, split=True
            ) is not None:
                # measured r4 (chained-scan, 9x9 'same'): 12.03 ms vs the
                # VPU kernel's 16.17 at 24 MP f32 (1.34x), 3.94 vs 4.78
                # at 6.3 MP; rel err ~7e-6 (not bit-parity -> opt-in via
                # RLConfig.conv_precision='high', never default-f32)
                return _conv_pallas_mxu_vmappable(a3, k3, mode, "bf16x3")
        # Measured on v5e, 9x9 'same' conv (ms, r3 bench.py --kernels):
        #   6.3 MP — pallas(VPU fori) f32 4.7 / bf16 3.5, pallas_mxu
        #   (in-VMEM banded matmul) f32 5.1 / bf16 2.5, XLA mxu f32 10.6 /
        #   bf16 7.7;  24 MP — pallas f32 16.1 / bf16 10.4, pallas_mxu
        #   f32 17.0 / bf16 6.4, XLA mxu f32 44.8 / bf16 30.1.
        # bf16 routes to the MXU-resident banded-matmul kernel (1.4-1.6x
        # the VPU tap loop: the 256/nk MAC inflation runs at MXU rather
        # than issue-bound VPU rate, and operands never leave VMEM —
        # unlike the XLA-level 'mxu' backend, which loses to its own HBM
        # reshape traffic).  f32 stays on the VPU kernel: HIGHEST-precision
        # matmul passes eat the MXU's edge.  Small kernels stay on the
        # fused XLA stencil — kernel-launch + DMA overheads dominate below
        # ~81 taps and the stencil fuses with consumers.
        if (
            on_tpu
            and _MXU_THRESHOLD_TAPS <= taps <= _FFT_THRESHOLD_TAPS
            and nk <= 129  # band-window limit of the MXU kernel
            and a3.dtype == jnp.bfloat16
        ):
            from ics_tpu.ops.pallas_conv_mxu import mxu_tile_h

            if mxu_tile_h(a3.shape, a3.dtype.itemsize, mk, nk) is not None:
                return _conv_pallas_mxu_vmappable(a3, k3, mode, precision)
        if (
            on_tpu
            and _MXU_THRESHOLD_TAPS <= taps <= _FFT_THRESHOLD_TAPS
            and _pallas_tile_h(a3, mk) is not None
        ):
            # capped at the FFT threshold so huge kernels (e.g. correlating
            # with a full residual) never build giant Mosaic tap loops
            method = "pallas"
        elif (
            on_tpu
            and a3.dtype == jnp.bfloat16
            and taps > _FFT_THRESHOLD_TAPS
            and nk <= 128
        ):
            method = "mxu"  # rows-linear cost, small program, beats FFT
        elif taps <= _STENCIL_THRESHOLD_TAPS:
            method = "stencil"
        elif taps <= _FFT_THRESHOLD_TAPS:
            method = "direct"
        else:
            method = "fft"
    if method == "stencil":
        return _conv_stencil(a3, k3, mode)
    if method == "pallas":
        return _conv_pallas_vmappable(a3, k3, mode)
    if method == "pallas_mxu":
        return _conv_pallas_mxu_vmappable(a3, k3, mode, precision)
    if method == "mxu":
        return _conv_mxu(a3, k3, mode, precision)
    if method == "direct":
        return _conv_direct(a3, k3, mode, precision)
    if method == "fft":
        return _conv_fft(a3, k3, mode, fast_len=True)
    raise ValueError(f"unknown method {method!r}")


def convolve2d(
    a: jax.Array,
    k: jax.Array,
    mode: str = "same",
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """scipy.signal.convolve-compatible 2-D convolution of (H, W) arrays.

    In ``valid`` mode ``a`` must be at least as large as ``k`` on both axes
    (the only pattern the solver uses — ref lib/deconvolution.pyx:478,571).
    """
    out = _dispatch(a[jnp.newaxis], k[jnp.newaxis], mode, method, precision)
    return out[0]


def convolve_rgb(
    a: jax.Array,
    k: jax.Array,
    mode: str = "same",
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Per-channel 2-D convolution of an (H, W, C) image.

    ``k`` is (MK, NK, C) — each channel convolves with its own kernel, the
    pattern of every solver conv (ref lib/deconvolution.pyx:477-478) — or
    (MK, NK), broadcast across channels.
    """
    if k.ndim == 2:
        k = jnp.broadcast_to(k[..., jnp.newaxis], (*k.shape, a.shape[-1]))
    a3 = jnp.moveaxis(a, -1, 0)  # (C, H, W)
    k3 = jnp.moveaxis(k, -1, 0)
    out = _dispatch(a3, k3, mode, method, precision)
    return jnp.moveaxis(out, 0, -1)


def fft_autocorrelate_same(patch: jax.Array) -> jax.Array:
    """``convolve(t, rot90(t, 2), mode='same')`` per channel, via one FFT.

    This is the residual-whiteness autocovariance of the stopping criterion
    (ref lib/deconvolution.pyx:631-634).  Convolving with the 180°-rotated
    patch equals correlating the patch with itself, so the spectrum is
    |F(t)|² up to the linear-convolution shift — one rfft2 + irfft2 per call
    instead of scipy's two FFTs per channel.

    patch: (H, W, C) → (H, W, C)

    The FFT runs over ``axes=(0, 1)`` of the (H, W, C) array directly — a
    transposed (C, H, W) batch triggers an XLA:CPU fft-thunk layout
    RET_CHECK under SPMD sharding, and the channel count is tiny anyway.
    """
    m, n, c = patch.shape
    mf, nf = 2 * m - 1, 2 * n - 1
    sm, sn = _next_fast_len(mf), _next_fast_len(nf)
    ft = jnp.fft.rfft2(patch, s=(sm, sn), axes=(0, 1))
    # conv(t, rot180(t))[j] = sum_m t[m] t[m - j + (P-1)]: the correlation
    # theorem gives F = ft * conj(ft) modulated by the rot180 shift, which in
    # index space is a circular shift by (m-1, n-1) of the |F|² inverse.
    full = jnp.fft.irfft2(ft * jnp.conj(ft), s=(sm, sn), axes=(0, 1))
    full = jnp.roll(full, shift=(m - 1, n - 1), axis=(0, 1))[:mf, :nf]
    oy, ox = (mf - m) // 2, (nf - n) // 2
    out = lax.slice(full, (oy, ox, 0), (oy + m, ox + n, c))
    return out.astype(patch.dtype)
