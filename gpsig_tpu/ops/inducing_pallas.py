"""Fused Pallas TPU kernels for inducing-tensor covariances (Kzz, Kzx).

The SVGP training step's hot ops (`SURVEY.md §3.1`: `_K_tens` and
`_K_tens_vs_seq` inside the fused `Kuu_Kuf_Kff` call,
`gpsig/kernels.py:263-340`) are **HBM-bandwidth bound** under XLA: the
(len_tensors, 2 n_Z, 2 n_Z) base Gram and the (len_tensors, n_Z, N, L)
cross Gram round-trip HBM between the matmul, exp, second-difference and
per-slot product/recursion stages (measured ~6 + 7.5 ms per ELBO step at
the benchmark configuration — ~100x above the compute floor).  These
kernels keep every intermediate in VMEM: inputs are a few hundred KB of
(augmented) inducing-tensor and sequence vectors, outputs are the small
(M+1, n_Z, n_Z) / (M+1, n_Z, N) level stacks.

Increment algebra (cancellation-free, shared with `signature_pallas`):

* Kzz slot Grams with ``increments=True``: ``G11+G00-G10-G01`` evaluated as
  ``exp(A00) * (expm1(d01+d10+dxx) - expm1(d01) - expm1(d10))`` over
  norm-augmented value/difference vectors — the inducing pair (z0, z1) is
  initialized from *consecutive observations* (`utils.py:10-16`), so the
  naive four-exp difference cancels exactly like sequence increments do.
* Kzx slot Grams: the (z-increment x time-increment) entry is
  ``exp(A0) * (exp(dZA) * expm1(dA0 + ddA) - expm1(dA0))`` where
  ``A0 = A(z0, x_t)``, ``dZA = A(z1, x_t) - A(z0, x_t)`` (augmented
  difference dot — exact) and ``dA0/ddA`` are the small time-step terms.

Both kernels carry custom VJPs whose backward passes are fused Pallas
kernels too (the reference trains through these covariances,
`gpsig/models.py:39-59`).  The backward grids are small, so each grid cell
writes its own per-block gradient slabs and XLA reduces them — no
cross-cell accumulation semantics in the kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gram import (exp_accurate, mat12_cross_from_dots,
                   mat12_onesided_from_dots, mat12_plain_from_dots)
from .signature_pallas import (SUPPORTED_BASES, _expm1, _make_cumsums,
                               _norm_chain_col, _norm_chain_row, _step_norms)

f32 = jnp.float32


def _hdot(a, b):
    """(d, M) x (d, N) -> (M, N), full f32."""
    return lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=lax.Precision.HIGHEST,
    )


def _lgrad(rhs_arr, Wt):
    """d(lhs) of T = lhs^T rhs under cotangent Wt: (d, N) x (M, N) -> (d, M)."""
    return lax.dot_general(
        rhs_arr, Wt, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        precision=lax.Precision.HIGHEST,
    )


def _rgrad(lhs_arr, Wt):
    """d(rhs) of T = lhs^T rhs under cotangent Wt: (d, M) x (M, N) -> (d, N)."""
    return lax.dot_general(
        lhs_arr, Wt, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        precision=lax.Precision.HIGHEST,
    )


def _slot_pack(num_levels: int):
    """[(level, [slot indices])] with the reference's triangular packing
    (level m uses slots m(m-1)/2 .. m(m-1)/2+m-1, `signature_algs.py:90`)."""
    out, k = [], 0
    for m in range(1, num_levels + 1):
        out.append((m, list(range(k, k + m))))
        k += m
    return out


# ---------------------------------------------------------------------------
# input prep (XLA-side, differentiable; adjoints ride jax.vjp of these)
# ---------------------------------------------------------------------------


def _aug_value(Z, base, lhs):
    """(..., d) -> (..., d2) norm-augmented value vectors."""
    if base == "linear":
        return Z
    n = -0.5 * jnp.sum(jnp.square(Z), axis=-1, keepdims=True)
    ones = jnp.ones_like(n)
    return (jnp.concatenate([Z, n, ones], axis=-1) if lhs
            else jnp.concatenate([Z, ones, n], axis=-1))


def _aug_diff(Z0, Z1, base, lhs):
    """Difference vectors with the exact norm-channel difference."""
    dZ = Z1 - Z0
    if base == "linear":
        return dZ
    dn = -0.5 * jnp.sum((Z1 + Z0) * dZ, axis=-1, keepdims=True)
    zeros = jnp.zeros_like(dn)
    return (jnp.concatenate([dZ, dn, zeros], axis=-1) if lhs
            else jnp.concatenate([dZ, zeros, dn], axis=-1))


def _prep_tensors(Z, base, increments, lhs, nZp):
    """(lt, nZ, [2,] d) -> value/diff arrays (lt, d2, nZp), f32 (padding
    replicates the first tensor; results are cropped)."""
    lt, nZ = Z.shape[0], Z.shape[1]
    if increments:
        V = _aug_value(Z[:, :, 0, :], base, lhs)
        D = _aug_diff(Z[:, :, 0, :], Z[:, :, 1, :], base, lhs)
    else:
        V = _aug_value(Z, base, lhs)
        D = jnp.zeros_like(V)
    if nZp != nZ:
        V = jnp.concatenate(
            [V, jnp.broadcast_to(V[:, :1], (lt, nZp - nZ, V.shape[-1]))], 1
        )
        D = jnp.concatenate(
            [D, jnp.broadcast_to(D[:, :1], (lt, nZp - nZ, D.shape[-1]))], 1
        )
    return (jnp.swapaxes(V, 1, 2).astype(f32),
            jnp.swapaxes(D, 1, 2).astype(f32))


def _prep_seq(X, base, L_pad):
    """(N, L, d) -> value/diff arrays (d2, N*L_pad) (rhs augmentation);
    repeat-last time padding keeps tail time-increments exactly zero."""
    N, L, d = X.shape
    if L_pad != L:
        tail = jnp.repeat(X[:, -1:, :], L_pad - L, axis=1)
        X = jnp.concatenate([X, tail], axis=1)
    Xn = jnp.concatenate([X[:, 1:], X[:, -1:]], axis=1)
    V = _aug_value(X, base, lhs=False)
    D = _aug_diff(X, Xn, base, lhs=False)
    d2 = V.shape[-1]
    return (jnp.transpose(V, (2, 0, 1)).reshape(d2, -1).astype(f32),
            jnp.transpose(D, (2, 0, 1)).reshape(d2, -1).astype(f32))


# ---------------------------------------------------------------------------
# Kzz: fused tensor-vs-tensor levels (`tensor_kern`, signature_algs.py:76-99)
# ---------------------------------------------------------------------------


def _slot_gram_zz(vl, dl, vr, dr, base, increments):
    """(BN, BN) slot Gram from augmented blocks."""
    if base == "linear":
        return _hdot(dl, dr) if increments else _hdot(vl, vr)
    A00 = _hdot(vl, vr)
    if base == "matern12":
        if not increments:
            return mat12_plain_from_dots(A00, exp=exp_accurate)
        ndx, ndy = _step_norms(dl, dr)
        return mat12_cross_from_dots(
            A00, _hdot(vl, dr), _hdot(dl, vr), _hdot(dl, dr), ndx, ndy,
            exp=exp_accurate, expm1=_expm1)
    if not increments:
        return exp_accurate(A00)
    d01 = _hdot(vl, dr)
    d10 = _hdot(dl, vr)
    dxx = _hdot(dl, dr)
    return exp_accurate(A00) * (
        _expm1(d01 + d10 + dxx) - _expm1(d01) - _expm1(d10)
    )


def _slot_gram_zz_bwd(vl, dl, vr, dr, Mbar, base, increments):
    """Grad blocks (g_vl, g_dl, g_vr, g_dr) of one slot Gram."""
    z = jnp.zeros_like(vl)
    if base == "linear":
        if increments:
            return z, _lgrad(dr, Mbar), jnp.zeros_like(vr), _rgrad(dl, Mbar)
        return _lgrad(vr, Mbar), z, _rgrad(vl, Mbar), jnp.zeros_like(dr)
    if base == "matern12":
        A00 = _hdot(vl, vr)
        if not increments:
            _, vjp = jax.vjp(
                lambda a: mat12_plain_from_dots(a, exp=exp_accurate), A00)
            W, = vjp(Mbar)
            return _lgrad(vr, W), z, _rgrad(vl, W), jnp.zeros_like(dr)
        ndx, ndy = _step_norms(dl, dr)
        _, vjp = jax.vjp(
            lambda args: mat12_cross_from_dots(
                *args, exp=exp_accurate, expm1=_expm1),
            (A00, _hdot(vl, dr), _hdot(dl, vr), _hdot(dl, dr), ndx, ndy))
        (W_A00, W_d01, W_d10, W_dxx, W_nx, W_ny), = vjp(Mbar)
        g_vl = _lgrad(vr, W_A00) + _lgrad(dr, W_d01)
        g_dl = (_lgrad(vr, W_d10) + _lgrad(dr, W_dxx)
                + _norm_chain_col(dl, W_nx, ndx))
        g_vr = _rgrad(vl, W_A00) + _rgrad(dl, W_d10)
        g_dr = (_rgrad(vl, W_d01) + _rgrad(dl, W_dxx)
                + _norm_chain_row(dr, W_ny, ndy))
        return g_vl, g_dl, g_vr, g_dr
    A00 = _hdot(vl, vr)
    eA = exp_accurate(A00)
    if not increments:
        W = Mbar * eA
        return _lgrad(vr, W), z, _rgrad(vl, W), jnp.zeros_like(dr)
    d01 = _hdot(vl, dr)
    d10 = _hdot(dl, vr)
    dxx = _hdot(dl, dr)
    es, e01, e10 = _expm1(d01 + d10 + dxx), _expm1(d01), _expm1(d10)
    Mk = eA * (es - e01 - e10)
    W_A00 = Mbar * Mk
    W_d01 = Mbar * (eA * (es - e01))
    W_d10 = Mbar * (eA * (es - e10))
    W_dxx = Mbar * (eA * (es + 1.0))
    g_vl = _lgrad(vr, W_A00) + _lgrad(dr, W_d01)
    g_dl = _lgrad(vr, W_d10) + _lgrad(dr, W_dxx)
    g_vr = _rgrad(vl, W_A00) + _rgrad(dl, W_d10)
    g_dr = _rgrad(vl, W_d01) + _rgrad(dl, W_dxx)
    return g_vl, g_dl, g_vr, g_dr


def _kernel_tens_fwd(vl_ref, dl_ref, vr_ref, dr_ref, out_ref, *, BN: int,
                     num_levels: int, base: str, increments: bool,
                     symmetric: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body():
        out_ref[0] = jnp.ones((BN, BN), f32)
        k = 0
        for m in range(1, num_levels + 1):
            R = None
            for _ in range(m):
                vl = vl_ref[k, :, pl.ds(i * BN, BN)]
                dl = dl_ref[k, :, pl.ds(i * BN, BN)]
                vr = vr_ref[k, :, pl.ds(j * BN, BN)]
                dr = dr_ref[k, :, pl.ds(j * BN, BN)]
                Mk = _slot_gram_zz(vl, dl, vr, dr, base, increments)
                R = Mk if R is None else Mk * R
                k += 1
            out_ref[m] = R

    if symmetric:
        @pl.when(j >= i)
        def _():
            body()

        @pl.when(j < i)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    else:
        body()


def _kernel_tens_bwd(vl_ref, dl_ref, vr_ref, dr_ref, ct_ref, gl_ref, gr_ref,
                     *, BN: int, num_levels: int, lt: int, base: str,
                     increments: bool, symmetric: bool):
    """Per-cell grad slabs: gl/gr are (2*lt, d2, BN) pages — value rows at
    slot k, diff rows at lt + k; XLA reduces over the opposite grid axis."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    d2 = vl_ref.shape[1]

    def compute():
        for m, slots in _slot_pack(num_levels):
            ct = ct_ref[m]
            blocks, Ms = [], []
            for k in slots:
                vl = vl_ref[k, :, pl.ds(i * BN, BN)]
                dl = dl_ref[k, :, pl.ds(i * BN, BN)]
                vr = vr_ref[k, :, pl.ds(j * BN, BN)]
                dr = dr_ref[k, :, pl.ds(j * BN, BN)]
                blocks.append((k, vl, dl, vr, dr))
                Ms.append(_slot_gram_zz(vl, dl, vr, dr, base, increments))
            n = len(Ms)
            pre, suf = [None] * n, [None] * n
            acc = None
            for a in range(n):
                pre[a] = acc
                acc = Ms[a] if acc is None else acc * Ms[a]
            acc = None
            for a in range(n - 1, -1, -1):
                suf[a] = acc
                acc = Ms[a] if acc is None else acc * Ms[a]
            for a, (k, vl, dl, vr, dr) in enumerate(blocks):
                excl = pre[a]
                if suf[a] is not None:
                    excl = suf[a] if excl is None else excl * suf[a]
                Mbar = ct if excl is None else ct * excl
                g_vl, g_dl, g_vr, g_dr = _slot_gram_zz_bwd(
                    vl, dl, vr, dr, Mbar, base, increments
                )
                gl_ref[0, 0, k] = g_vl
                gl_ref[0, 0, lt + k] = g_dl
                gr_ref[0, 0, k] = g_vr
                gr_ref[0, 0, lt + k] = g_dr

    if symmetric:
        @pl.when(j >= i)
        def _():
            compute()

        @pl.when(j < i)
        def _():
            gl_ref[...] = jnp.zeros(gl_ref.shape, gl_ref.dtype)
            gr_ref[...] = jnp.zeros(gr_ref.shape, gr_ref.dtype)
    else:
        compute()


def _tens_fwd_call(Vl, Dl, Vr, Dr, *, nb: int, BN: int, num_levels: int,
                   base: str, increments: bool, symmetric: bool,
                   interpret: bool):
    lt, d2, nZp = Vl.shape
    spec_l = pl.BlockSpec((lt, d2, nZp), lambda i, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel_tens_fwd, BN=BN, num_levels=num_levels, base=base,
        increments=increments, symmetric=symmetric,
    )
    return pl.pallas_call(
        kernel,
        grid=(nb, nb),
        in_specs=[spec_l, spec_l, spec_l, spec_l],
        out_specs=pl.BlockSpec((num_levels + 1, BN, BN),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (num_levels + 1, nb * BN, nb * BN), f32
        ),
        interpret=interpret,
    )(Vl, Dl, Vr, Dr)


_FUSED_TENS_BUDGET = 64 * 1024 * 1024  # total VMEM headroom for the
# resident arrays + working set.  The Kzz kernel's scoped set is a few MB
# and rides Mosaic's default scoped limit; the lane-batched Kzx kernels
# override it via CompilerParams (see `_zx_compiler_params`) because the
# (BN, x_block*Lp) recursion chain exceeds the 16 MB default at useful
# widths while fitting the chip's 128 MB VMEM comfortably.


def fused_tens_shapes_ok(lt: int, nZ: int, d: int, num_levels: int,
                         base: str = "rbf", L=None, x_block: int = 1) -> bool:
    """Whether the fused inducing kernels' VMEM working set fits at these
    shapes.  Both kernels keep the full (lt, d2, nZp) value/difference
    arrays VMEM-resident (constant-index in_specs), so the set scales with
    lt*nZ*d; widths past ``_MAX_FUSED_FEATURES`` decline outright (Mosaic
    register spills scale with d beyond any block model — see
    `signature_pallas.fused_shape_ok`).  Dispatch sites
    (`kernels.py:_K_tens/_K_tens_vs_seq`) fall back to the XLA graph.

    L=None sizes the Kzz kernel (4 resident arrays + (BN, BN) recursion
    tiles); L set sizes the Kzx kernel (2 resident arrays + pipelined
    (d2, W=x_block*Lp) lane-concatenated example blocks + the VMEM
    gz-accumulation slab + the (BN, W) recursion chain kept live for the
    backward sweep).  ``x_block`` is the lane-batch width the caller will
    run; feasibility is always judged at the narrowest fallback
    (x_block=1) so the dispatch contract stays "fits at SOME width" —
    `pick_x_block` chooses the widest width that fits."""
    from .signature_pallas import _MAX_FUSED_FEATURES

    d2 = d + (0 if base == "linear" else 2)
    if d2 > _MAX_FUSED_FEATURES:
        return False
    BN = 128
    nZp = -(-nZ // BN) * BN
    if L is None:
        resident = 4 * lt * d2 * nZp * 4
        work = (4 + 2 * num_levels) * BN * BN * 4
    else:
        resident, work = _zx_vmem_model(lt, nZ, d2, num_levels, L, x_block)
    return resident + work <= _FUSED_TENS_BUDGET


def _zx_vmem_model(lt, nZ, d2, num_levels, L, x_block):
    BN = 128
    nZp = -(-nZ // BN) * BN
    Lp = max(128, -(-L // 128) * 128)
    W = x_block * Lp
    resident = 2 * lt * d2 * nZp * 4
    work = (
        2 * 2 * 2 * d2 * W * 4         # double-buffered xv/xd lane blocks
        + 2 * 2 * lt * d2 * BN * 4     # gz slab + per-slot grad blocks
        + (4 + 3 * num_levels) * BN * W * 4  # recursion chain tiles
        + 2 * x_block * W * 4          # segment indicator/expansion masks
    )
    return resident, work


def _zx_compiler_params(lt, nZp, d2, num_levels, L_true, BX, interpret):
    """Scoped-VMEM override for the Kzx kernels.  Mosaic's default scoped
    limit (16 MB on v5e) is below the lane-batched backward kernel's
    recursion-chain working set at x_block>2; the chip has 128 MB of VMEM,
    so grant the working set whatever the resident/pipelined buffers leave
    (capped at 100 MB, mirroring `signature_pallas._pick_blocks`)."""
    if interpret:
        return None
    from .signature_pallas import _TOTAL_VMEM

    resident, work = _zx_vmem_model(lt, nZp, d2, num_levels, L_true, BX)
    limit = min(100 * 1024 * 1024, _TOTAL_VMEM - resident)
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(limit, work + (1 << 20))
    )


def _tens_bwd_compiler_params(lt, d2, nZp, BN, num_levels, interpret):
    """Scoped-VMEM override for the Kzz backward kernel.  The matern12
    bwd traces the dots-level closed form through jax.vjp inside the
    kernel (weight tiles + step-norm chains), and at the flagship scale
    (lt=10, nZ=500, d=14) its per-cell working set measures ~19 MB —
    above Mosaic's 16 MB default scoped limit (round-5 compile failure:
    'Scoped allocation with size 18.92M ... exceeded ... by 2.91M').
    The resident inputs are tiny (4 slot-flat arrays + the cotangent
    block), so grant the working set the same 100 MB ceiling the Kzx
    kernels use."""
    if interpret:
        return None
    from .signature_pallas import _TOTAL_VMEM

    resident = (4 * lt * d2 * nZp + (num_levels + 1) * BN * BN
                + 2 * 2 * lt * d2 * BN) * 4
    work = (8 + 4 * num_levels + 6 * lt) * BN * BN * 4
    limit = min(100 * 1024 * 1024, _TOTAL_VMEM - resident)
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(limit, work + (1 << 20))
    )


def pick_x_block(lt: int, nZ: int, d: int, num_levels: int,
                 base: str = "rbf", *, L: int, max_block: int = 8) -> int:
    """Widest lane-batch width (examples per Kzx grid cell) whose VMEM
    working set fits the budget.  The fwd/bwd kernels lane-concatenate
    ``x_block`` examples' time axes into one (BN, x_block*Lp) MXU tile
    (VERDICT r3 item 2 — the per-example sweep left the MXU at ~1/3 of
    f32 peak); wider is faster until the recursion chain spills."""
    d2 = d + (0 if base == "linear" else 2)
    bx = max(1, int(max_block))
    while bx > 1:
        resident, work = _zx_vmem_model(lt, nZ, d2, num_levels, L, bx)
        if resident + work <= _FUSED_TENS_BUDGET:
            return bx
        bx //= 2
    return 1


def fused_tensor_levels(Z, *, num_levels: int, base: str = "rbf",
                        increments: bool = True, block: int = 128,
                        interpret: bool = False):
    """(num_levels+1, nZ, nZ) inducing-tensor level Grams, fully fused.

    Z: (lt, nZ, 2, d) with increments, else (lt, nZ, d); lt = M(M+1)/2.
    Differentiable via a fused backward kernel.
    """
    if base not in SUPPORTED_BASES:
        raise ValueError(f"unsupported base {base!r} for the fused kernel")
    nZ = Z.shape[1]
    BN = min(block, max(128, -(-nZ // 8) * 8))
    nb = -(-nZ // BN)
    nZp = nb * BN
    core = _make_tens_core(
        num_levels, base, increments, nb, BN, nZp, interpret
    )
    out = core(Z)
    return out[:, :nZ, :nZ]


@functools.lru_cache(maxsize=None)
def _make_tens_core(num_levels, base, increments, nb, BN, nZp, interpret):
    def prep(Z):
        Vl, Dl = _prep_tensors(Z, base, increments, True, nZp)
        Vr, Dr = _prep_tensors(Z, base, increments, False, nZp)
        return Vl, Dl, Vr, Dr

    def fwd(Z):
        Vl, Dl, Vr, Dr = prep(Z)
        out = _tens_fwd_call(
            Vl, Dl, Vr, Dr, nb=nb, BN=BN, num_levels=num_levels, base=base,
            increments=increments, symmetric=True, interpret=interpret,
        )
        # mirror the skipped lower-triangular blocks
        blk = jnp.arange(nZp) // BN
        offdiag = (blk[:, None] != blk[None, :]).astype(out.dtype)
        out = out + jnp.swapaxes(out, 1, 2) * offdiag[None]
        return out, Z

    @jax.custom_vjp
    def core(Z):
        return fwd(Z)[0]

    def bwd(Z, ct):
        flats, pullback = jax.vjp(prep, Z)
        Vl, Dl, Vr, Dr = flats
        ct = ct.astype(f32)
        # adjoint of the mirror: upper blocks also receive the transposed
        # cotangent of their mirrored lower images
        blk = jnp.arange(nZp) // BN
        offdiag = (blk[:, None] != blk[None, :]).astype(ct.dtype)
        ct_u = ct + jnp.swapaxes(ct * offdiag[None], 1, 2)
        lt, d2 = Vl.shape[0], Vl.shape[1]
        spec_l = pl.BlockSpec((lt, d2, nZp), lambda i, j: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        ct_spec = pl.BlockSpec((num_levels + 1, BN, BN),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _kernel_tens_bwd, BN=BN, num_levels=num_levels, lt=lt,
            base=base, increments=increments, symmetric=True,
        )
        gl, gr = pl.pallas_call(
            kernel,
            grid=(nb, nb),
            in_specs=[spec_l, spec_l, spec_l, spec_l, ct_spec],
            out_specs=[
                pl.BlockSpec((1, 1, 2 * lt, d2, BN),
                             lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2 * lt, d2, BN),
                             lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, nb, 2 * lt, d2, BN), f32),
                jax.ShapeDtypeStruct((nb, nb, 2 * lt, d2, BN), f32),
            ],
            compiler_params=_tens_bwd_compiler_params(
                lt, d2, nZp, BN, num_levels, interpret),
            interpret=interpret,
        )(Vl, Dl, Vr, Dr, ct_u)
        # (nb, nb, 2lt, d2, BN): sum over the opposite grid axis, unblock
        gL = jnp.transpose(gl.sum(axis=1), (1, 2, 0, 3)).reshape(
            2 * lt, d2, nZp
        )
        gR = jnp.transpose(gr.sum(axis=0), (1, 2, 0, 3)).reshape(
            2 * lt, d2, nZp
        )
        gVl, gDl = gL[:lt], gL[lt:]
        gVr, gDr = gR[:lt], gR[lt:]
        (gZ,) = pullback((gVl, gDl, gVr, gDr))
        return (gZ,)

    core.defvjp(lambda Z: fwd(Z), bwd)
    return core


# ---------------------------------------------------------------------------
# Kzx: fused tensor-vs-sequence levels
# (`signature_kern_tens_vs_seq_first_order`, signature_algs.py:101-127)
# ---------------------------------------------------------------------------


def _slot_gram_zx(vl, dl, xv, xd, base, increments, difference, tail_mask):
    """(BN, Lp) slot Gram row-block against one example's time axis.

    With ``difference`` the columns are time-increments, evaluated
    cancellation-free (see module docstring)."""
    if base == "linear":
        if increments:
            M = _hdot(dl, xd) if difference else _hdot(dl, xv)
        else:
            M = _hdot(vl, xd) if difference else _hdot(vl, xv)
        return M if tail_mask is None else M * tail_mask
    A0 = _hdot(vl, xv)
    if base == "matern12":
        # lhs step = the slot's (z0 -> z1) increment, rhs step = the time
        # increment; the dots-level closed forms take (A00, d01=time gap,
        # d10=z gap, dxx) with the matching step-norm floors
        if increments:
            dZA = _hdot(dl, xv)
            if difference:
                ndz, ndt = _step_norms(dl, xd)
                return mat12_cross_from_dots(
                    A0, _hdot(vl, xd), dZA, _hdot(dl, xd), ndz, ndt,
                    exp=exp_accurate, expm1=_expm1)
            ndz, _ = _step_norms(dl, xd)
            M = mat12_onesided_from_dots(A0, dZA, ndz, exp=exp_accurate,
                                         expm1=_expm1)
            return M if tail_mask is None else M * tail_mask
        if difference:
            _, ndt = _step_norms(dl, xd)
            return mat12_onesided_from_dots(A0, _hdot(vl, xd), ndt,
                                            exp=exp_accurate, expm1=_expm1)
        M = mat12_plain_from_dots(A0, exp=exp_accurate)
        return M if tail_mask is None else M * tail_mask
    if increments:
        dZA = _hdot(dl, xv)
        if difference:
            dA0 = _hdot(vl, xd)
            ddA = _hdot(dl, xd)
            return exp_accurate(A0) * (
                exp_accurate(dZA) * _expm1(dA0 + ddA) - _expm1(dA0)
            )
        M = exp_accurate(A0) * _expm1(dZA)  # G(z1,x) - G(z0,x)
        return M if tail_mask is None else M * tail_mask
    if difference:
        dA0 = _hdot(vl, xd)
        return exp_accurate(A0) * _expm1(dA0)
    M = exp_accurate(A0)
    return M if tail_mask is None else M * tail_mask


def _slot_gram_zx_bwd(vl, dl, xv, xd, Mbar, base, increments, difference,
                      tail_mask):
    """(g_vl, g_dl, g_xv, g_xd) of one tens-vs-seq slot Gram."""
    zv = jnp.zeros_like(vl)
    zx = jnp.zeros_like(xv)
    if tail_mask is not None and (base == "linear" or not difference):
        Mbar = Mbar * tail_mask
    if base == "linear":
        lhs = dl if increments else vl
        rhs = xd if difference else xv
        g_lhs = _lgrad(rhs, Mbar)
        g_rhs = _rgrad(lhs, Mbar)
        g_vl = zv if increments else g_lhs
        g_dl = g_lhs if increments else zv
        g_xv = zx if difference else g_rhs
        g_xd = g_rhs if difference else zx
        return g_vl, g_dl, g_xv, g_xd
    if base == "matern12":
        A0 = _hdot(vl, xv)
        if increments and difference:
            ndz, ndt = _step_norms(dl, xd)
            _, vjp = jax.vjp(
                lambda args: mat12_cross_from_dots(
                    *args, exp=exp_accurate, expm1=_expm1),
                (A0, _hdot(vl, xd), _hdot(dl, xv), _hdot(dl, xd), ndz, ndt))
            (W_A0, W_dA0, W_dZA, W_ddA, W_nz, W_nt), = vjp(Mbar)
            g_vl = _lgrad(xv, W_A0) + _lgrad(xd, W_dA0)
            g_dl = (_lgrad(xv, W_dZA) + _lgrad(xd, W_ddA)
                    + _norm_chain_col(dl, W_nz, ndz))
            g_xv = _rgrad(vl, W_A0) + _rgrad(dl, W_dZA)
            g_xd = (_rgrad(vl, W_dA0) + _rgrad(dl, W_ddA)
                    + _norm_chain_row(xd, W_nt, ndt))
            return g_vl, g_dl, g_xv, g_xd
        if increments:  # one-sided z difference
            ndz, _ = _step_norms(dl, xd)
            _, vjp = jax.vjp(
                lambda args: mat12_onesided_from_dots(
                    *args, exp=exp_accurate, expm1=_expm1),
                (A0, _hdot(dl, xv), ndz))
            (W_A0, W_dZA, W_nz), = vjp(Mbar)
            return (_lgrad(xv, W_A0),
                    _lgrad(xv, W_dZA) + _norm_chain_col(dl, W_nz, ndz),
                    _rgrad(vl, W_A0) + _rgrad(dl, W_dZA), zx)
        if difference:  # one-sided time difference
            _, ndt = _step_norms(dl, xd)
            _, vjp = jax.vjp(
                lambda args: mat12_onesided_from_dots(
                    *args, exp=exp_accurate, expm1=_expm1),
                (A0, _hdot(vl, xd), ndt))
            (W_A0, W_dA0, W_nt), = vjp(Mbar)
            return (_lgrad(xv, W_A0) + _lgrad(xd, W_dA0), zv,
                    _rgrad(vl, W_A0),
                    _rgrad(vl, W_dA0) + _norm_chain_row(xd, W_nt, ndt))
        _, vjp = jax.vjp(
            lambda a: mat12_plain_from_dots(a, exp=exp_accurate), A0)
        W_A0, = vjp(Mbar)
        return _lgrad(xv, W_A0), zv, _rgrad(vl, W_A0), zx
    A0 = _hdot(vl, xv)
    eA0 = exp_accurate(A0)
    if increments:
        dZA = _hdot(dl, xv)
        edZ = exp_accurate(dZA)
        if difference:
            dA0 = _hdot(vl, xd)
            ddA = _hdot(dl, xd)
            em1s = _expm1(dA0 + ddA)
            em1d = _expm1(dA0)
            M = eA0 * (edZ * em1s - em1d)
            W_A0 = Mbar * M
            W_dZA = Mbar * (eA0 * edZ * em1s)
            W_dA0 = Mbar * (eA0 * (edZ * (em1s + 1.0) - (em1d + 1.0)))
            W_ddA = Mbar * (eA0 * edZ * (em1s + 1.0))
            g_vl = _lgrad(xv, W_A0) + _lgrad(xd, W_dA0)
            g_dl = _lgrad(xv, W_dZA) + _lgrad(xd, W_ddA)
            g_xv = _rgrad(vl, W_A0) + _rgrad(dl, W_dZA)
            g_xd = _rgrad(vl, W_dA0) + _rgrad(dl, W_ddA)
            return g_vl, g_dl, g_xv, g_xd
        em1z = _expm1(dZA)
        W_A0 = Mbar * (eA0 * em1z)
        W_dZA = Mbar * (eA0 * (em1z + 1.0))
        return (_lgrad(xv, W_A0), _lgrad(xv, W_dZA),
                _rgrad(vl, W_A0) + _rgrad(dl, W_dZA), zx)
    if difference:
        dA0 = _hdot(vl, xd)
        em1d = _expm1(dA0)
        W_A0 = Mbar * (eA0 * em1d)
        W_dA0 = Mbar * (eA0 * (em1d + 1.0))
        return (_lgrad(xv, W_A0) + _lgrad(xd, W_dA0), zv,
                _rgrad(vl, W_A0), _rgrad(vl, W_dA0))
    W_A0 = Mbar * eA0
    return _lgrad(xv, W_A0), zv, _rgrad(vl, W_A0), zx


def _kernel_zx_fwd(vl_ref, dl_ref, xv_ref, xd_ref, out_ref, *, BN: int,
                   BX: int, BXp: int, Lp: int, L_true: int, num_levels: int,
                   base: str, increments: bool, difference: bool, precision):
    i = pl.program_id(0)
    W = BX * Lp
    _, cum_lanes = _make_cumsums(precision, seg=Lp)
    if difference:
        tail_mask = None
    else:
        cl = lax.broadcasted_iota(jnp.int32, (BN, W), 1) % Lp
        tail_mask = (cl < L_true).astype(f32)

    # per-example level-sum reduction: (BN, W) -> (BXp, BN) in one matmul.
    # BXp >= BX pads the output block's sublane dim to Mosaic's granule
    # (8); rows >= BX have an all-zero indicator, so they write zeros that
    # the wrapper slices away.
    srow = lax.broadcasted_iota(jnp.int32, (BXp, W), 0)
    scol = lax.broadcasted_iota(jnp.int32, (BXp, W), 1)
    seg_ind = (scol // Lp == srow).astype(f32)

    def seg_sum(R):
        return lax.dot_general(
            seg_ind, R, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=lax.Precision.HIGHEST,
        )  # (BXp, BN)

    xv = xv_ref[:]  # (d2, W)
    xd = xd_ref[:]

    out_ref[0] = jnp.ones((BXp, BN), f32)
    k = 0
    for m in range(1, num_levels + 1):
        R = None
        for _ in range(m):
            vl = vl_ref[k, :, pl.ds(i * BN, BN)]
            dl = dl_ref[k, :, pl.ds(i * BN, BN)]
            Mk = _slot_gram_zx(vl, dl, xv, xd, base, increments,
                               difference, tail_mask)
            R = Mk if R is None else Mk * cum_lanes(R)
            k += 1
        out_ref[m] = seg_sum(R)


def _kernel_zx_bwd(vl_ref, dl_ref, xv_ref, xd_ref, ct_ref, gz_ref, gxv_ref,
                   gxd_ref, *, BN: int, BX: int, BXp: int, Lp: int,
                   L_true: int, lt: int, num_levels: int, base: str,
                   increments: bool, difference: bool, precision):
    """gz accumulates across the (inner) example-block sweep in VMEM."""
    i = pl.program_id(0)
    n_id = pl.program_id(1)
    W = BX * Lp
    _, cum_lanes = _make_cumsums(precision, seg=Lp)
    if difference:
        tail_mask = None
    else:
        cl = lax.broadcasted_iota(jnp.int32, (BN, W), 1) % Lp
        tail_mask = (cl < L_true).astype(f32)

    # rows >= BX of the (BXp-padded) cotangent block expand through an
    # all-zero indicator row, contributing nothing
    erow = lax.broadcasted_iota(jnp.int32, (BXp, W), 0)
    ecol = lax.broadcasted_iota(jnp.int32, (BXp, W), 1)
    seg_expand = (ecol // Lp == erow).astype(f32)

    def expand(g):  # (BXp, BN) -> (BN, W)
        return lax.dot_general(
            g, seg_expand, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=lax.Precision.HIGHEST,
        )

    xv = xv_ref[:]
    xd = xd_ref[:]
    ct = ct_ref[:]  # (M+1, BXp, BN)

    g_xv = jnp.zeros_like(xv)
    g_xd = jnp.zeros_like(xd)
    for m, slots in _slot_pack(num_levels):
        blocks, Ms, chain = [], [], []
        R = None
        for k in slots:
            vl = vl_ref[k, :, pl.ds(i * BN, BN)]
            dl = dl_ref[k, :, pl.ds(i * BN, BN)]
            Mk = _slot_gram_zx(vl, dl, xv, xd, base, increments,
                               difference, tail_mask)
            blocks.append((k, vl, dl))
            Ms.append(Mk)
            R = Mk if R is None else Mk * cum_lanes(R)
            chain.append(R)
        Rbar = expand(ct[m])  # (BN, W)
        for a in range(len(slots) - 1, -1, -1):
            if a > 0:
                Mbar = Rbar * cum_lanes(chain[a - 1])
            else:
                Mbar = Rbar
            k, vl, dl = blocks[a]
            g_vl, g_dl, gxv_c, gxd_c = _slot_gram_zx_bwd(
                vl, dl, xv, xd, Mbar, base, increments, difference,
                tail_mask,
            )
            gz_ref[0, k] = jnp.where(n_id == 0, g_vl,
                                     gz_ref[0, k] + g_vl)
            gz_ref[0, lt + k] = jnp.where(n_id == 0, g_dl,
                                          gz_ref[0, lt + k] + g_dl)
            g_xv = g_xv + gxv_c
            g_xd = g_xd + gxd_c
            if a > 0:
                Rbar = cum_lanes(Ms[a] * Rbar, reverse=True)
    gxv_ref[0, 0] = g_xv
    gxd_ref[0, 0] = g_xd


def fused_tens_vs_seq_levels(Z, X, *, num_levels: int, base: str = "rbf",
                             increments: bool = True,
                             difference: bool = True, block: int = 128,
                             x_block="auto", fast_math="high",
                             interpret: bool = False):
    """(num_levels+1, nZ, N) tensor-vs-sequence level kernels, fully fused.

    Z: (lt, nZ, 2, d) with increments else (lt, nZ, d); X: (N, L, d).
    ``x_block`` examples share each grid cell's MXU pass — their time axes
    are lane-concatenated into one (BN, x_block*Lp) tile and segment-reset
    cumsums (`signature_pallas._make_cumsums(seg=Lp)`) keep the recursions
    independent; 'auto' picks the widest width whose VMEM working set fits
    (`pick_x_block`).  Differentiable via a fused backward kernel.
    Reference hot loop: `gpsig/signature_algs.py:101-127`.
    """
    if base not in SUPPORTED_BASES:
        raise ValueError(f"unsupported base {base!r} for the fused kernel")
    nZ = Z.shape[1]
    N, L, d = X.shape
    BN = min(block, max(128, -(-nZ // 8) * 8))
    nb = -(-nZ // BN)
    nZp = nb * BN
    Lp = max(128, -(-L // 128) * 128)
    if x_block == "auto":
        # MEASURED default (round-4 on-chip A/B at the benchmark config,
        # nZ=500 N=50 L=93 d=14 M=4): the full SVGP step runs 128.7
        # steps/s at x_block=1 vs 117.3 at x_block=8, even though the
        # isolated kernel is ~8% faster at width 4-8 (3.9 -> 3.6 ms
        # fwd+bwd) — the kernel is VPU/transcendental-bound, its
        # per-example pipeline already overlaps, and the wider grads/
        # layout cost the surrounding step more than the lanes save.
        # Lane widths stay available (and hardware-validated at 1/2/4/8)
        # as an explicit tunable for shapes where the balance differs
        # (e.g. many short sequences per grid cell).
        x_block = 1
    BX = max(1, int(x_block))
    NB = -(-N // BX)
    Np = NB * BX
    core = _make_zx_core(
        num_levels, base, increments, difference, nb, BN, nZp, Lp, L,
        BX, Np, fast_math, interpret,
    )
    out = core(Z, X)  # (M+1, NB*BXp, nZp); BXp >= BX pads Mosaic's granule
    BXp = _bxp(BX)
    if BXp != BX:
        NB = Np // BX
        out = out.reshape(num_levels + 1, NB, BXp, nZp)[:, :, :BX]
        out = out.reshape(num_levels + 1, Np, nZp)
    return jnp.transpose(out[:, :N, :nZ], (0, 2, 1))


def _bxp(bx: int) -> int:
    """Output-block sublane width: Mosaic requires the second-minor block
    dim be a multiple of 8 (or the whole array dim), so narrow lane counts
    pad their output rows up to the granule."""
    return bx if bx % 8 == 0 else 8


@functools.lru_cache(maxsize=None)
def _make_zx_core(num_levels, base, increments, difference, nb, BN, nZp, Lp,
                  L_true, BX, Np, fast_math, interpret):
    from .signature_pallas import _recursion_precision

    precision = _recursion_precision(fast_math)
    NB = Np // BX
    W = BX * Lp
    BXp = _bxp(BX)

    def prep(Z, X):
        Vl, Dl = _prep_tensors(Z, base, increments, True, nZp)
        if X.shape[0] != Np:
            X = jnp.concatenate(
                [X, jnp.broadcast_to(X[:1], (Np - X.shape[0],) + X.shape[1:])],
                axis=0,
            )
        Xv, Xd = _prep_seq(X, base, Lp)
        return Vl, Dl, Xv, Xd

    def fwd(Z, X):
        Vl, Dl, Xv, Xd = prep(Z, X)
        lt, d2 = Vl.shape[0], Vl.shape[1]
        spec_z = pl.BlockSpec((lt, d2, nZp), lambda i, n: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_x = pl.BlockSpec((d2, W), lambda i, n: (0, n),
                              memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _kernel_zx_fwd, BN=BN, BX=BX, BXp=BXp, Lp=Lp, L_true=L_true,
            num_levels=num_levels, base=base, increments=increments,
            difference=difference, precision=precision,
        )
        out = pl.pallas_call(
            kernel,
            grid=(nb, NB),
            in_specs=[spec_z, spec_z, spec_x, spec_x],
            out_specs=pl.BlockSpec((num_levels + 1, BXp, BN),
                                   lambda i, n: (0, n, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (num_levels + 1, NB * BXp, nZp), f32),
            compiler_params=_zx_compiler_params(
                lt, nZp, d2, num_levels, L_true, BX, interpret),
            interpret=interpret,
        )(Vl, Dl, Xv, Xd)
        return out, (Z, X)

    @jax.custom_vjp
    def core(Z, X):
        return fwd(Z, X)[0]

    def bwd(res, ct):
        Z, X = res
        flats, pullback = jax.vjp(prep, Z, X)
        Vl, Dl, Xv, Xd = flats
        lt, d2 = Vl.shape[0], Vl.shape[1]
        ct = ct.astype(f32)
        spec_z = pl.BlockSpec((lt, d2, nZp), lambda i, n: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_x = pl.BlockSpec((d2, W), lambda i, n: (0, n),
                              memory_space=pltpu.VMEM)
        ct_spec = pl.BlockSpec((num_levels + 1, BXp, BN),
                               lambda i, n: (0, n, i),
                               memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _kernel_zx_bwd, BN=BN, BX=BX, BXp=BXp, Lp=Lp, L_true=L_true,
            lt=lt, num_levels=num_levels, base=base, increments=increments,
            difference=difference, precision=precision,
        )
        gz, gxv, gxd = pl.pallas_call(
            kernel,
            grid=(nb, NB),
            in_specs=[spec_z, spec_z, spec_x, spec_x, ct_spec],
            out_specs=[
                pl.BlockSpec((1, 2 * lt, d2, BN),
                             lambda i, n: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d2, W), lambda i, n: (i, n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d2, W), lambda i, n: (i, n, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, 2 * lt, d2, BN), f32),
                jax.ShapeDtypeStruct((nb, NB, d2, W), f32),
                jax.ShapeDtypeStruct((nb, NB, d2, W), f32),
            ],
            compiler_params=_zx_compiler_params(
                lt, nZp, d2, num_levels, L_true, BX, interpret),
            interpret=interpret,
        )(Vl, Dl, Xv, Xd, ct)
        gZl = jnp.transpose(gz, (1, 2, 0, 3)).reshape(
            2 * lt, d2, nZp
        )
        gVl, gDl = gZl[:lt], gZl[lt:]
        gXv = jnp.transpose(gxv.sum(axis=0), (1, 0, 2)).reshape(d2, -1)
        gXd = jnp.transpose(gxd.sum(axis=0), (1, 0, 2)).reshape(d2, -1)
        gZ, gX = pullback((gVl, gDl, gXv, gXd))
        return gZ, gX

    core.defvjp(fwd, bwd)
    return core
