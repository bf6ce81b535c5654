"""SignatureKernel: orchestration of signature covariance computations.

TPU-native re-design of the reference's `gpsig/kernels.py` (994 LoC,
GPflow-`Kernel` subclass with autoflow/session machinery).  Here the kernel
object is a *static configuration* — every covariance method is a pure
function of ``(raw_params, arrays)`` and jit/grad/vmap/pjit-composable.
Parameters live in a flat dict of unconstrained arrays (see
``gpsig_tpu.params``); optimizers act on the raw values.

Responsibilities mirrored from the reference:

* input reshaping 2-D -> (N, L, d)                  <- `kernels.py:410-419`
* ARD lengthscale scaling + lag augmentation        <- `kernels.py:342-398`
* dispatch to full-rank vs low-rank algorithms      <- `kernels.py:424-453`
* per-level normalization (jitter + rsqrt diag)     <- `kernels.py:430-433`
* per-level variances and global sigma scaling      <- `kernels.py:471`
* public API: K, Kdiag, K_tens, K_tens_vs_seq, and the fused
  K_tens_n_seq_covs / K_seq_n_seq_covs              <- `kernels.py:400-761`

Known reference bugs NOT replicated: the `full_X2_cov=True` branch NameErrors
(`kernels.py:723-728`) are implemented correctly here.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import config as cfg
from . import params as pm
from .ops import base_kernels, lags, low_rank
from .ops import signature as sig_ops


def _as_sequences(X, num_features: int):
    """Accept (N, L, d) or flattened (N, L*d) and return (N, L, d)."""
    X = jnp.asarray(X)
    if X.ndim == 2:
        if X.shape[-1] % num_features != 0:
            raise ValueError(
                f"flattened input width {X.shape[-1]} is not a multiple of "
                f"num_features={num_features}"
            )
        X = X.reshape(X.shape[0], -1, num_features)
    elif X.ndim != 3:
        raise ValueError(f"sequences must be rank 2 or 3, got rank {X.ndim}")
    return X


def _sp_supported_bases():
    from .ops import signature_pallas as sp

    return sp.SUPPORTED_BASES


def _auto_gram_block(N: int, L: int, budget_bytes: int = 128 * 2**20) -> int:
    """Example-block size for the blocked MXU Gram path: the largest block
    whose (B, B, L-1, L-1) f32 increment tile fits the budget (a few live
    copies ride the level recursion), floored at 8 and capped at 64."""
    per_pair = 4 * max(L - 1, 1) ** 2
    bs = int(np.sqrt(max(budget_bytes // max(per_pair, 1), 1)))
    return max(8, min(int(N), bs, 64))


class SignatureKernel:
    """Truncated signature covariance over sequences.

    Static configuration + pure covariance functions.  ``init_params`` builds
    the raw parameter dict; every public method takes that dict first.

    Args mirror the reference ctor (`kernels.py:18-88`):
      num_features: state-space dimension d of the sequences.
      num_levels: signature truncation level M.
      order: discretization order, 1..M (``<=0`` or ``>=M`` clamps to M).
      normalization: per-level normalization to unit diagonal.
      difference: use path increments (False = integrated path).
      variances: initial per-level variances, scalar or (M+1,).
      lengthscales: initial ARD lengthscales, scalar / (d,) / None.
      num_lags: number of lagged copies appended per channel (0/None = off).
      low_rank / num_components / rank_bound / sparsity: Nystrom + random
        projection options ('sqrt' | 'log' | 'lin'; 'exact' for testing).
      base: base-kernel name in ``gpsig_tpu.ops.base_kernels.BASE_KERNELS``.
      base_options: static options for the base kernel (e.g. poly degree, Q).
      fused: dispatch control for the fused Pallas covariance kernels
        ('auto' | 'on' | 'off').  'auto' uses them whenever supported
        (TPU backend, f32 regime, rbf/linear base); 'off' always runs the
        reference-shaped XLA graphs (the f64 validation path and the
        baseline leg in ``bench.py``); 'on' requires a supported
        configuration and raises at covariance time otherwise.
      fast_math: MXU precision for the fused level-recursion matmuls:
        'high' (default; one-sided bf16x3 splitting, ~f32 accuracy),
        True/'bf16' (single-pass bf16 — fast but its ~0.4% rounding is
        amplified by per-level normalization), False (full f32 / HIGHEST).
    """

    def __init__(self, num_features: int, num_levels: int, *, order: int = 1,
                 normalization: bool = True, difference: bool = True,
                 variances=1.0, lengthscales=1.0, num_lags: int | None = None,
                 low_rank: bool = False, num_components: int = 50,
                 rank_bound: int | None = None, sparsity: str = "sqrt",
                 base: str = "rbf", base_options: dict | None = None,
                 fused: str = "auto", fast_math="high"):
        self.num_features = int(num_features)
        self.num_levels = int(num_levels)
        self.order = (
            self.num_levels
            if (order <= 0 or order >= self.num_levels)
            else int(order)
        )
        self.normalization = bool(normalization)
        self.difference = bool(difference)

        if low_rank:
            if self.order != 1:
                raise NotImplementedError(
                    "low-rank mode requires order == 1 "
                    "(matches reference `kernels.py:59-60`)"
                )
            if sparsity not in ("sqrt", "log", "lin", "exact",
                                "rademacher", "gauss"):
                raise ValueError(f"unknown sparsity {sparsity!r}")
            if num_components is None or num_components <= 0:
                raise ValueError("num_components must be a positive integer")
            if rank_bound is not None and rank_bound <= 0:
                raise ValueError("rank_bound must be None or positive")
        self.low_rank = bool(low_rank)
        self.num_components = int(num_components)
        self.rank_bound = int(rank_bound) if rank_bound else self.num_components
        self.sparsity = sparsity

        if num_lags is None:
            self.num_lags = 0
        else:
            if not isinstance(num_lags, (int, np.integer)) or num_lags < 0:
                raise ValueError("num_lags must be a nonnegative integer or None")
            self.num_lags = int(num_lags)

        self.base = base
        self.base_options = dict(base_options or {})

        if fused not in ("auto", "on", "off"):
            raise ValueError(f"fused must be 'auto'|'on'|'off', got {fused!r}")
        self.fused = fused
        self.fast_math = fast_math

        # initial constrained values (converted to raw in init_params)
        self._init_variances = np.broadcast_to(
            np.asarray(variances, dtype=np.float64), (self.num_levels + 1,)
        ).copy()
        if lengthscales is None:
            self._init_lengthscales = None
        else:
            self._init_lengthscales = np.broadcast_to(
                np.asarray(lengthscales, dtype=np.float64), (self.num_features,)
            ).copy()

        # bijector registry for this kernel's parameters.  The base-kernel
        # bijectors are registered HERE (not in init_params) so that
        # ``constrain`` is correct on any instance — e.g. a fused='off'
        # twin sharing another instance's params for an A/B leg; before
        # this, such a twin silently constrained base params (mixing,
        # spectral alpha/omega/gamma, poly gamma) with 'identity',
        # producing garbage covariances (round-5 finding).
        self.bijectors: dict[str, str] = {"variances": "positive", "sigma": "positive"}
        if self._init_lengthscales is not None:
            self.bijectors["lengthscales"] = "positive"
        if self.num_lags > 0:
            self.bijectors["lags"] = "sigmoid"
            self.bijectors["gamma"] = "positive"
        _, base_bij = base_kernels.init_params(
            self.base, None,
            num_features=self.num_features * (self.num_lags + 1),
            **self.base_options,
        )
        self.bijectors.update(base_bij)

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------

    def init_params(self, key=None, dtype=None) -> dict:
        """Raw (unconstrained) parameter pytree."""
        dtype = dtype or cfg.default_float()
        raw = {
            "variances": pm.raw_init(self._init_variances, "positive", dtype),
            "sigma": pm.raw_init(1.0, "positive", dtype),
        }
        if self._init_lengthscales is not None:
            raw["lengthscales"] = pm.raw_init(
                self._init_lengthscales, "positive", dtype
            )
        if self.num_lags > 0:
            init_lags = 0.1 * np.arange(1, self.num_lags + 1)
            gamma = 1.0 / np.arange(1, self.num_lags + 2)
            gamma = gamma / gamma.sum()
            raw["lags"] = pm.raw_init(init_lags, "sigmoid", dtype)
            raw["gamma"] = pm.raw_init(gamma, "positive", dtype)
        base_raw, base_bij = base_kernels.init_params(
            self.base, key, num_features=self.num_features * (self.num_lags + 1),
            dtype=dtype, **self.base_options,
        )
        raw.update(base_raw)
        self.bijectors.update(base_bij)
        return raw

    def constrain(self, raw: dict) -> dict:
        cp = {
            name: pm.constrain(val, self.bijectors.get(name, "identity"))
            for name, val in raw.items()
        }
        # static (non-trainable) base-kernel config, e.g. the poly degree
        # (`gpsig/kernels.py:838` pins it with trainable=False)
        cp.update(base_kernels.static_params(self.base, **self.base_options))
        return cp

    def _base_kern(self, cp: dict):
        fn = base_kernels.get(self.base)
        return lambda A, B=None: fn(cp, A, B)

    # ------------------------------------------------------------------
    # scaling / lags (cf. `kernels.py:342-398`)
    # ------------------------------------------------------------------

    def _scale_sequences(self, cp: dict, X):
        """(N, L, d) -> (N, L, (num_lags+1)*d) scaled, lag-augmented."""
        N, L, _ = X.shape
        if self.num_lags > 0:
            X = lags.add_lags_to_sequences(X, cp["lags"].astype(X.dtype))
        else:
            X = X[:, :, None, :]
        if "lengthscales" in cp:
            X = X / cp["lengthscales"].astype(X.dtype)[None, None, None, :]
        if self.num_lags > 0:
            X = X * cp["gamma"].astype(X.dtype)[None, None, :, None]
        return X.reshape(N, L, (self.num_lags + 1) * self.num_features)

    def _scale_tensors(self, cp: dict, Z, increments: bool):
        """Scale packed inducing tensors; Z is
        (len_tensors, n_Z, [2,] (num_lags+1)*d)."""
        if "lengthscales" not in cp and self.num_lags == 0:
            return Z
        shape = Z.shape
        Z = Z.reshape(*shape[:-1], self.num_lags + 1, self.num_features)
        if "lengthscales" in cp:
            Z = Z / cp["lengthscales"].astype(Z.dtype)
        if self.num_lags > 0:
            Z = Z * cp["gamma"].astype(Z.dtype)[:, None]
        return Z.reshape(shape)

    # ------------------------------------------------------------------
    # unnormalized level computations (cf. `kernels.py:188-340`)
    # ------------------------------------------------------------------

    def _K_seq(self, cp: dict, X, X2=None):
        """(M+1, N1, N2) unnormalized per-level kernels.

        On the TPU f32 path with a supported base and order 1 this runs the
        fused Pallas seq kernel (VMEM-resident tiles, custom VJP) — so
        ``K()`` and the InducingSequences covariances
        (``K_seq_n_seq_covs``) never materialize the (N1, L, N2, L) Gram;
        other configurations keep the reference-shaped XLA graph."""
        if self.difference and self._fused_tens_ok():
            from .ops import signature_pallas as sp

            L_max = max(X.shape[1], X2.shape[1] if X2 is not None else 0)
            if self._fused_shape_guard(
                sp.fused_shape_ok(L_max, X.shape[-1], self.order, self.base),
                "seq",
            ):
                return sp.fused_first_order_levels(
                    X, X2, num_levels=self.num_levels, order=self.order,
                    base=self.base, fast_math=self.fast_math,
                )
            # VMEM working set exceeds the chip at this L even at the
            # smallest block: blocked/XLA paths below (or use K_blocked /
            # the sequence-parallel path for long L)
        if self.difference:
            # capability-based dispatch (VERDICT r4 item 2): bases without
            # a fused Pallas kernel (or shapes it declines) route through
            # the blocked MXU path with cancellation-free closed-form
            # increment Grams — the public K()/fused covariances never
            # materialize the (N1, L, N2, L) base Gram at any base in the
            # f32 regime (the reference's one-hot-loop-for-every-base
            # structure, `kernels.py:786-994` x `signature_algs.py:8-35`)
            inc_cross, _ = self._closed_form_fns(cp, X.dtype)
            if inc_cross is not None:
                from .ops import gram as gram_ops

                L_max = max(X.shape[1],
                            X2.shape[1] if X2 is not None else 0)
                bs = _auto_gram_block(
                    max(X.shape[0], X2.shape[0] if X2 is not None else 1),
                    L_max,
                )
                return gram_ops.blocked_first_order_levels(
                    self._base_kern(cp), X, X2,
                    num_levels=self.num_levels, order=self.order,
                    difference=True, block_size=bs,
                    precision=jax.lax.Precision.HIGHEST,
                    increment_fn=inc_cross,
                )
        kern = self._base_kern(cp)
        N1, L1, d = X.shape
        if X2 is None:
            M = kern(X.reshape(N1 * L1, d)).reshape(N1, L1, N1, L1)
        else:
            N2, L2, _ = X2.shape
            M = kern(X.reshape(N1 * L1, d), X2.reshape(N2 * L2, d)).reshape(
                N1, L1, N2, L2
            )
        if self.order == 1:
            return sig_ops.signature_kern_first_order(
                M, self.num_levels, difference=self.difference
            )
        return sig_ops.signature_kern_higher_order(
            M, self.num_levels, order=self.order, difference=self.difference
        )

    def _K_seq_diag(self, cp: dict, X):
        """(M+1, N) unnormalized per-level diagonals.

        On the TPU f32 fused path this leg was the largest non-fused piece
        of the SVGP step (2.6 of 10.4 ms, 25%, round-3 ablation profile):
        the reference-shaped graph builds the (N, L, L) Gram, second-
        differences it (catastrophic cancellation in f32), and runs the
        cumsum-ladder recursion (HBM-bound).  Route it through the blocked
        MXU path instead — cancellation-free closed-form increment Grams,
        triangular-matmul cumsums, exact telescoped level 1.  Capability-
        based: every base with a closed form takes this path in the f32
        regime (any backend), not just the Pallas-supported ones."""
        if self.difference:
            from .ops import gram as gram_ops

            _, inc_diag = self._closed_form_fns(cp, X.dtype)
            if inc_diag is not None:
                # single straight-line block (no lax.map/dynamic-slice —
                # those blow up compile time inside unrolled grad graphs)
                precision = jax.lax.Precision.HIGHEST
                G = inc_diag(X, precision)  # (N, L-1, L-1), pre-differenced
                if self.order == 1:
                    lvls = gram_ops.first_order_levels_batched(
                        G, self.num_levels, difference=False,
                        precision=precision,
                    )
                else:
                    lvls = gram_ops.higher_order_levels_batched(
                        G, self.num_levels, self.order, difference=False,
                        precision=precision,
                    )
                return lvls.at[1].set(
                    gram_ops.level1_exact_diag(inc_diag, X, precision)
                )
        M = self._base_kern(cp)(X)  # (N, L, L) batched Gram
        if self.order == 1:
            return sig_ops.signature_kern_first_order(
                M, self.num_levels, difference=self.difference
            )
        return sig_ops.signature_kern_higher_order(
            M, self.num_levels, order=self.order, difference=self.difference
        )

    def _fused_supported(self):
        """Whether the fused Pallas covariance kernels apply to this
        configuration: TPU backend, f32 regime, base kernel with an
        in-kernel increment algebra (`ops/signature_pallas.SUPPORTED_BASES`
        — capability-based, not a hardcoded name list)."""
        from .ops import signature_pallas as sp

        return (
            self.base in sp.SUPPORTED_BASES
            and not jax.config.jax_enable_x64
            and jax.default_backend() == "tpu"
        )

    def _closed_form_fns(self, cp: dict, dtype):
        """(inc_cross, inc_diag) when the cancellation-free closed-form
        fast paths apply (capability-based dispatch, VERDICT r4 item 2):
        any base with a closed-form increment algebra
        (`ops/gram.increment_gram_fns`), in the f32 regime where the naive
        second difference cancels catastrophically, unless the public
        ``fused='off'`` knob pins the reference-shaped XLA graphs.  The
        f64 regime keeps the reference-shaped graphs (exact there — the
        validation path)."""
        if self.fused == "off" or dtype != jnp.float32:
            return None, None
        from .ops import gram as gram_ops

        return gram_ops.increment_gram_fns(self.base, cp)

    def _fused_tens_ok(self):
        """Dispatch decision for the fused Pallas covariance kernels,
        controlled by the public ``fused`` knob ('auto'|'on'|'off'):
        unsupported configurations fall back to the XLA reference path
        (which is also the f64 validation path), and ``fused='on'`` makes
        an unsupported fallback an error instead of silent."""
        if self.fused == "off":
            return False
        ok = self._fused_supported()
        if self.fused == "on" and not ok:
            raise ValueError(
                "fused='on' but the fused Pallas kernels do not support "
                f"this configuration (base={self.base!r}, "
                f"x64={jax.config.jax_enable_x64}, "
                f"backend={jax.default_backend()!r}); they require a "
                "TPU backend, f32 regime, and a base in "
                f"{_sp_supported_bases()}"
            )
        return ok

    def _fused_shape_guard(self, ok: bool, what: str) -> bool:
        """Shape-level fused dispatch: fall back to the XLA graph when the
        fused kernels' VMEM plan does not fit (wide d, huge lt*nZ, long L)
        — but make the fallback an error under ``fused='on'``, matching
        the knob's no-silent-fallback contract."""
        if not ok and self.fused == "on":
            raise ValueError(
                f"fused='on' but the fused {what} kernel's VMEM working "
                "set does not fit at these shapes; use fused='auto' to "
                "fall back to the XLA path"
            )
        return ok

    def _K_tens(self, cp: dict, Z, increments: bool):
        if self._fused_tens_ok():
            from .ops import inducing_pallas as ind_pallas

            if self._fused_shape_guard(
                ind_pallas.fused_tens_shapes_ok(
                    Z.shape[0], Z.shape[1], Z.shape[-1], self.num_levels,
                    self.base,
                ),
                "Kzz",
            ):
                return ind_pallas.fused_tensor_levels(
                    Z, num_levels=self.num_levels, base=self.base,
                    increments=increments,
                )
        if increments:
            # capability-based dispatch: each incremental slot pair is a
            # 2-point path, so the cancellation-free cross increment Grams
            # apply verbatim (reference `kernels.py:274-277`) — except for
            # bases where the slot geometry defeats the algebra (see
            # `gram.tens_closed_form_ok`: spectral measured 80x worse than
            # naive vs an f64 oracle at learned-increment pair geometry)
            from .ops import gram as gram_ops

            inc_cross, _ = self._closed_form_fns(cp, Z.dtype)
            if inc_cross is not None and gram_ops.tens_closed_form_ok(
                    self.base):
                M = gram_ops.tens_slot_grams(inc_cross, Z)
                return sig_ops.tensor_kern(M, self.num_levels)
        kern = self._base_kern(cp)
        len_tensors, n_Z = Z.shape[0], Z.shape[1]
        d = Z.shape[-1]
        if increments:
            M = kern(Z.reshape(len_tensors, 2 * n_Z, d)).reshape(
                len_tensors, n_Z, 2, n_Z, 2
            )
            M = M[:, :, 1, :, 1] + M[:, :, 0, :, 0] - M[:, :, 1, :, 0] - M[:, :, 0, :, 1]
        else:
            M = kern(Z)
        return sig_ops.tensor_kern(M, self.num_levels)

    def _K_tens_vs_seq(self, cp: dict, Z, X, increments: bool):
        if self._fused_tens_ok():
            if self.order != 1:
                # the fused Kzx kernel is order-1 only; honor the knob's
                # no-silent-fallback contract
                if self.fused == "on":
                    raise ValueError(
                        "fused='on' but the fused Kzx kernel supports "
                        f"order=1 only (this kernel has order={self.order});"
                        " use fused='auto' to fall back to the XLA path"
                    )
            else:
                return self._fused_or_xla_tens_vs_seq(cp, Z, X, increments)
        return self._closed_or_xla_tens_vs_seq(cp, Z, X, increments)

    def _closed_or_xla_tens_vs_seq(self, cp: dict, Z, X, increments: bool):
        if increments and self.difference:
            # capability-based dispatch (any order): slot pairs are 2-point
            # paths, so the closed-form cross increment Grams give the
            # (z-increment x time-increment) slot entries cancellation-free
            # (`signature_algs.py:101-160`); the time recursion then runs
            # as MXU triangular matmuls over the pre-differenced stack
            inc_cross, _ = self._closed_form_fns(cp, X.dtype)
            if inc_cross is not None:
                from .ops import gram as gram_ops

                M = gram_ops.tens_vs_seq_slot_grams(inc_cross, Z, X)
                return gram_ops.tens_vs_seq_levels_mxu(
                    M, self.num_levels, order=self.order
                )
        return self._xla_tens_vs_seq(cp, Z, X, increments)

    def _fused_or_xla_tens_vs_seq(self, cp: dict, Z, X, increments: bool):
        from .ops import inducing_pallas as ind_pallas

        if self._fused_shape_guard(
            ind_pallas.fused_tens_shapes_ok(
                Z.shape[0], Z.shape[1], Z.shape[-1], self.num_levels,
                self.base, L=X.shape[1],
            ),
            "Kzx",
        ):
            return ind_pallas.fused_tens_vs_seq_levels(
                Z, X, num_levels=self.num_levels, base=self.base,
                increments=increments, difference=self.difference,
                fast_math=self.fast_math,
            )
        return self._closed_or_xla_tens_vs_seq(cp, Z, X, increments)

    def _xla_tens_vs_seq(self, cp: dict, Z, X, increments: bool):
        kern = self._base_kern(cp)
        len_tensors, n_Z = Z.shape[0], Z.shape[1]
        d = Z.shape[-1]
        N, L, _ = X.shape
        X_flat = X.reshape(N * L, d)
        if increments:
            M = kern(Z.reshape(len_tensors * n_Z * 2, d), X_flat).reshape(
                len_tensors, n_Z, 2, N, L
            )
            M = M[:, :, 1] - M[:, :, 0]
        else:
            M = kern(Z.reshape(len_tensors * n_Z, d), X_flat).reshape(
                len_tensors, n_Z, N, L
            )
        if self.order == 1:
            return sig_ops.signature_kern_tens_vs_seq_first_order(
                M, self.num_levels, difference=self.difference
            )
        return sig_ops.signature_kern_tens_vs_seq_higher_order(
            M, self.num_levels, order=self.order, difference=self.difference
        )

    # low-rank feature maps ------------------------------------------------

    def _K_seq_lr_feat(self, cp: dict, key, X, nys_samples=None):
        """List of (M+1) low-rank factors for sequences."""
        k_nys, k_proj = jax.random.split(key)
        N, L, d = X.shape
        feat = low_rank.nystrom_map(
            k_nys, X.reshape(N * L, d), self._base_kern(cp),
            nys_samples=nys_samples, num_components=self.num_components,
            jitter=cfg.jitter(),
        ).reshape(N, L, -1)
        return low_rank.signature_kern_lr_feature(
            k_proj, feat, self.num_levels, self.rank_bound, self.sparsity,
            difference=self.difference,
        )

    def _K_tens_lr_feat(self, cp: dict, key, Z, increments: bool,
                        nys_samples=None):
        k_nys, k_proj = jax.random.split(key)
        len_tensors, n_Z = Z.shape[0], Z.shape[1]
        d = Z.shape[-1]
        if increments:
            feat = low_rank.nystrom_map(
                k_nys, Z.reshape(len_tensors * n_Z * 2, d), self._base_kern(cp),
                nys_samples=nys_samples, num_components=self.num_components,
                jitter=cfg.jitter(),
            ).reshape(len_tensors, n_Z, 2, -1)
            feat = feat[:, :, 1, :] - feat[:, :, 0, :]
        else:
            feat = low_rank.nystrom_map(
                k_nys, Z.reshape(len_tensors * n_Z, d), self._base_kern(cp),
                nys_samples=nys_samples, num_components=self.num_components,
                jitter=cfg.jitter(),
            ).reshape(len_tensors, n_Z, -1)
        return low_rank.tensor_kern_lr_feature(
            k_proj, feat, self.num_levels, self.rank_bound, self.sparsity
        )

    @staticmethod
    def _lr_gram(Phi_lvls, Phi2_lvls=None):
        Phi2_lvls = Phi_lvls if Phi2_lvls is None else Phi2_lvls
        return jnp.stack(
            [
                jnp.matmul(P, P2.T, precision=jax.lax.Precision.HIGHEST)
                for P, P2 in zip(Phi_lvls, Phi2_lvls)
            ],
            axis=0,
        )

    @staticmethod
    def _lr_diag(Phi_lvls):
        return jnp.stack([jnp.sum(jnp.square(P), axis=-1) for P in Phi_lvls], axis=0)

    # ------------------------------------------------------------------
    # public covariance API
    # ------------------------------------------------------------------

    def _level_scale(self, cp: dict, K_lvls):
        w = (cp["sigma"] * cp["variances"]).astype(K_lvls.dtype)
        return K_lvls * w.reshape((-1,) + (1,) * (K_lvls.ndim - 1))

    def _finalize(self, K_lvls, return_levels: bool):
        return K_lvls if return_levels else jnp.sum(K_lvls, axis=0)

    def K(self, params: dict, X, X2=None, *, return_levels: bool = False,
          key=None):
        """Signature kernel matrix between sequences (`kernels.py:400-476`)."""
        cp = self.constrain(params)
        X = _as_sequences(X, self.num_features)
        N1 = X.shape[0]
        X_scaled = self._scale_sequences(cp, X)
        jitter = cfg.jitter()

        if X2 is None:
            if self.low_rank:
                key = jax.random.PRNGKey(0) if key is None else key
                Phi_lvls = self._K_seq_lr_feat(cp, key, X_scaled)
                K_lvls = self._lr_gram(Phi_lvls)
            else:
                K_lvls = self._K_seq(cp, X_scaled)
            if self.normalization:
                K_lvls = K_lvls + jitter * jnp.eye(N1, dtype=K_lvls.dtype)[None]
                diag_sqrt = jnp.sqrt(
                    jnp.diagonal(K_lvls, axis1=-2, axis2=-1)
                )
                K_lvls = K_lvls / (
                    diag_sqrt[:, :, None] * diag_sqrt[:, None, :]
                )
        else:
            X2 = _as_sequences(X2, self.num_features)
            X2_scaled = self._scale_sequences(cp, X2)
            if self.low_rank:
                key = jax.random.PRNGKey(0) if key is None else key
                k_s, k_feat = jax.random.split(key)
                nys = self._joint_nystrom_samples(
                    k_s, X_scaled.reshape(-1, X_scaled.shape[-1]),
                    X2_scaled.reshape(-1, X2_scaled.shape[-1]),
                )
                Phi_lvls = self._K_seq_lr_feat(cp, k_feat, X_scaled, nys)
                Phi2_lvls = self._K_seq_lr_feat(cp, k_feat, X2_scaled, nys)
                K_lvls = self._lr_gram(Phi_lvls, Phi2_lvls)
            else:
                K_lvls = self._K_seq(cp, X_scaled, X2_scaled)
            if self.normalization:
                if self.low_rank:
                    d1 = self._lr_diag(Phi_lvls)
                    d2 = self._lr_diag(Phi2_lvls)
                else:
                    d1 = self._K_seq_diag(cp, X_scaled)
                    d2 = self._K_seq_diag(cp, X2_scaled)
                d1s = jnp.sqrt(d1 + jitter)
                d2s = jnp.sqrt(d2 + jitter)
                K_lvls = K_lvls / (d1s[:, :, None] * d2s[:, None, :])

        return self._finalize(self._level_scale(cp, K_lvls), return_levels)

    def K_blocked(self, params: dict, X, X2=None, *,
                  block_size: int = 16, diag_block_size: int = 64,
                  return_levels: bool = False, fast_math: bool = False,
                  method: str = "xla"):
        """Memory-bounded Gram for large N / long L (order-1 path).

        Equivalent to :meth:`K` but evaluated over ``(block, block)`` example
        tiles — peak memory O(block^2 L^2) instead of O(N^2 L^2).

        method:
          'xla'    — blocked lax.map evaluation with MXU cumsums
                     (``gpsig_tpu.ops.gram``); differentiable.
          'pallas' — fully fused VMEM-resident kernel
                     (``gpsig_tpu.ops.signature_pallas``); fastest,
                     differentiable (custom-VJP backward kernel), covers
                     all orders; base kernel must be 'rbf' or 'linear'
                     (others fall back to 'xla').
        fast_math: MXU mode for the recursion matmuls — False (HIGHEST),
          'high' (bf16x3 splitting, ~f32 accuracy) or True (single-pass
          bf16; see the class docstring for the accuracy caveat).
        """
        if self.low_rank:
            raise ValueError("use K() for the low-rank path")
        from .ops import gram as gram_ops

        precision = (
            jax.lax.Precision.DEFAULT if fast_math else jax.lax.Precision.HIGHEST
        )
        cp = self.constrain(params)
        X = _as_sequences(X, self.num_features)
        Xs = self._scale_sequences(cp, X)
        kern = self._base_kern(cp)
        jitter = cfg.jitter()

        if method == "pallas":
            # Dispatch story (documented): the fused kernel covers all
            # orders for rbf/linear bases at f32 (higher orders keep the
            # (order x order) grid of partial tensors in VMEM,
            # `signature_algs.py:60-72`); other bases fall back to the
            # blocked XLA path below — same math, still MXU cumsums.
            if self.base not in ("rbf", "linear"):
                method = "xla"
            elif jax.config.jax_enable_x64:
                raise ValueError(
                    "method='pallas' is incompatible with jax_enable_x64 "
                    "(Mosaic tracing recurses on x64 weak types); use "
                    "method='xla' for float64 validation runs"
                )
        if method == "pallas":
            return self._k_pallas(
                cp, Xs, X2, block_size=block_size,
                diag_block_size=diag_block_size,
                return_levels=return_levels, fast_math=fast_math,
                precision=precision,
            )
        if method != "xla":
            raise ValueError(f"unknown method {method!r}")

        # cancellation-free increment Grams for bases with a closed form
        # (rbf/linear/matern12/32/52/cosine, plus the param-dependent mix
        # and integer-degree poly); None falls back to naive second
        # differencing
        inc_cross, inc_diag = gram_ops.increment_gram_fns(self.base, cp)

        if X2 is None:
            K_lvls = gram_ops.blocked_first_order_levels(
                kern, Xs, num_levels=self.num_levels, order=self.order,
                difference=self.difference, block_size=block_size,
                precision=precision, increment_fn=inc_cross,
            )
            if self.normalization:
                K_lvls = K_lvls + jitter * jnp.eye(X.shape[0], dtype=K_lvls.dtype)[None]
                d1s = jnp.sqrt(jnp.diagonal(K_lvls, axis1=-2, axis2=-1))
                K_lvls = K_lvls / (d1s[:, :, None] * d1s[:, None, :])
        else:
            X2 = _as_sequences(X2, self.num_features)
            X2s = self._scale_sequences(cp, X2)
            K_lvls = gram_ops.blocked_first_order_levels(
                kern, Xs, X2s, num_levels=self.num_levels, order=self.order,
                difference=self.difference, block_size=block_size,
                precision=precision, increment_fn=inc_cross,
            )
            if self.normalization:
                d1 = gram_ops.blocked_first_order_levels_diag(
                    kern, Xs, num_levels=self.num_levels, order=self.order,
                    difference=self.difference, block_size=diag_block_size,
                    precision=precision, increment_diag_fn=inc_diag,
                )
                d2 = gram_ops.blocked_first_order_levels_diag(
                    kern, X2s, num_levels=self.num_levels, order=self.order,
                    difference=self.difference, block_size=diag_block_size,
                    precision=precision, increment_diag_fn=inc_diag,
                )
                K_lvls = K_lvls / (
                    jnp.sqrt(d1 + jitter)[:, :, None]
                    * jnp.sqrt(d2 + jitter)[:, None, :]
                )

        return self._finalize(self._level_scale(cp, K_lvls), return_levels)

    def _k_pallas(self, cp, Xs, X2, *, block_size, diag_block_size,
                  return_levels, fast_math, precision):
        """Fused-kernel Gram with XLA-path diagonals for normalization."""
        from .ops import gram as gram_ops
        from .ops import signature_pallas as sp

        base = self.base
        jitter = cfg.jitter()
        kern = self._base_kern(cp)
        symm = X2 is None
        if not symm:
            X2 = _as_sequences(X2, self.num_features)
            X2s = self._scale_sequences(cp, X2)
        else:
            X2s = None

        K_lvls = sp.fused_first_order_levels(
            Xs, X2s, num_levels=self.num_levels, order=self.order,
            base=base, difference=self.difference, block_i=block_size,
            block_j=max(8, block_size // 2), fast_math=fast_math,
        )
        if self.normalization:
            if symm:
                # normalize with the fused Gram's OWN diagonal: per-level
                # diagonals can be near zero (e.g. level 1 for paths whose
                # endpoints almost coincide), and only correlated
                # numerator/denominator errors cancel in the ratio
                K_lvls = K_lvls + jitter * jnp.eye(
                    K_lvls.shape[1], dtype=K_lvls.dtype
                )[None]
                d1s = jnp.sqrt(jnp.diagonal(K_lvls, axis1=-2, axis2=-1))
                d2s = d1s
            else:
                _, inc_diag = gram_ops.increment_gram_fns(self.base, cp)
                d1 = gram_ops.blocked_first_order_levels_diag(
                    kern, Xs, num_levels=self.num_levels, order=self.order,
                    difference=self.difference, block_size=diag_block_size,
                    precision=precision, increment_diag_fn=inc_diag,
                )
                d1s = jnp.sqrt(d1 + jitter)
                d2 = gram_ops.blocked_first_order_levels_diag(
                    kern, X2s, num_levels=self.num_levels, order=self.order,
                    difference=self.difference, block_size=diag_block_size,
                    precision=precision, increment_diag_fn=inc_diag,
                )
                d2s = jnp.sqrt(d2 + jitter)
            K_lvls = K_lvls / (d1s[:, :, None] * d2s[:, None, :])
        return self._finalize(self._level_scale(cp, K_lvls), return_levels)

    def _joint_nystrom_samples(self, key, flat1, flat2):
        """Shared Nystrom landmarks drawn from the union of two point sets
        (cf. `kernels.py:443-446`)."""
        allpts = jnp.concatenate([flat1, flat2], axis=0)
        idx, _ = low_rank.draw_indices(key, allpts.shape[0], self.num_components)
        return jnp.take(allpts, idx, axis=0)

    def Kdiag(self, params: dict, X, *, return_levels: bool = False, key=None):
        """Diagonal of the signature kernel matrix (`kernels.py:478-510`)."""
        cp = self.constrain(params)
        X = _as_sequences(X, self.num_features)
        N = X.shape[0]
        sig_var = cp["sigma"] * cp["variances"]

        if self.normalization:
            # normalized diag is exactly sigma*variances per level
            lvls = jnp.tile(sig_var[:, None], (1, N))
            return self._finalize(lvls, return_levels)

        X_scaled = self._scale_sequences(cp, X)
        if self.low_rank:
            key = jax.random.PRNGKey(0) if key is None else key
            Phi_lvls = self._K_seq_lr_feat(cp, key, X_scaled)
            K_lvls_diag = self._lr_diag(Phi_lvls)
        else:
            K_lvls_diag = self._K_seq_diag(cp, X_scaled)
        return self._finalize(self._level_scale(cp, K_lvls_diag), return_levels)

    def K_tens(self, params: dict, Z, *, increments: bool = False,
               return_levels: bool = False, key=None):
        """Covariance of inducing tensors (`kernels.py:512-536`)."""
        cp = self.constrain(params)
        Z = self._scale_tensors(cp, jnp.asarray(Z), increments)
        if self.low_rank:
            key = jax.random.PRNGKey(0) if key is None else key
            Phi_lvls = self._K_tens_lr_feat(cp, key, Z, increments)
            K_lvls = self._lr_gram(Phi_lvls)
        else:
            K_lvls = self._K_tens(cp, Z, increments)
        return self._finalize(self._level_scale(cp, K_lvls), return_levels)

    def K_tens_vs_seq(self, params: dict, Z, X, *, increments: bool = False,
                      return_levels: bool = False, key=None):
        """Cross-covariance tensors vs sequences (`kernels.py:538-588`)."""
        cp = self.constrain(params)
        Z = self._scale_tensors(cp, jnp.asarray(Z), increments)
        X = _as_sequences(X, self.num_features)
        X_scaled = self._scale_sequences(cp, X)
        jitter = cfg.jitter()

        if self.low_rank:
            key = jax.random.PRNGKey(0) if key is None else key
            k_s, k_feat = jax.random.split(key)
            nZflat = Z.reshape(-1, Z.shape[-1])
            nys = self._joint_nystrom_samples(
                k_s, nZflat, X_scaled.reshape(-1, X_scaled.shape[-1])
            )
            Phi_Z = self._K_tens_lr_feat(cp, k_feat, Z, increments, nys)
            Phi_X = self._K_seq_lr_feat(cp, k_feat, X_scaled, nys)
            Kzx_lvls = self._lr_gram(Phi_Z, Phi_X)
        else:
            Kzx_lvls = self._K_tens_vs_seq(cp, Z, X_scaled, increments)

        if self.normalization:
            if self.low_rank:
                Kxx_diag = self._lr_diag(Phi_X)
            else:
                Kxx_diag = self._K_seq_diag(cp, X_scaled)
            Kzx_lvls = Kzx_lvls / jnp.sqrt(Kxx_diag + jitter)[:, None, :]

        return self._finalize(self._level_scale(cp, Kzx_lvls), return_levels)

    def K_tens_n_seq_covs(self, params: dict, Z, X, *,
                          full_X_cov: bool = False, increments: bool = False,
                          return_levels: bool = False, key=None):
        """Fused Kzz, Kzx, Kxx(-diag) evaluation (`kernels.py:590-671`).

        Sharing the scaled inputs and the Kxx diagonal between Kzx
        normalization and the Kff output is the reference's main efficiency
        trick over stock GPflow (`models.py:15` docstring); it matters even
        more under XLA, which fuses the shared subgraphs once.
        """
        cp = self.constrain(params)
        Z = self._scale_tensors(cp, jnp.asarray(Z), increments)
        X = _as_sequences(X, self.num_features)
        N = X.shape[0]
        X_scaled = self._scale_sequences(cp, X)
        jitter = cfg.jitter()

        if self.low_rank:
            key = jax.random.PRNGKey(0) if key is None else key
            k_s, k_feat = jax.random.split(key)
            nys = self._joint_nystrom_samples(
                k_s, Z.reshape(-1, Z.shape[-1]),
                X_scaled.reshape(-1, X_scaled.shape[-1]),
            )
            Phi_Z = self._K_tens_lr_feat(cp, k_feat, Z, increments, nys)
            Phi_X = self._K_seq_lr_feat(cp, k_feat, X_scaled, nys)
            Kzz_lvls = self._lr_gram(Phi_Z)
            Kzx_lvls = self._lr_gram(Phi_Z, Phi_X)
        else:
            Kzz_lvls = self._K_tens(cp, Z, increments)
            Kzx_lvls = self._K_tens_vs_seq(cp, Z, X_scaled, increments)

        sig_var = cp["sigma"] * cp["variances"]

        if full_X_cov:
            if self.low_rank:
                Kxx_lvls = self._lr_gram(Phi_X)
            else:
                Kxx_lvls = self._K_seq(cp, X_scaled)
            if self.normalization:
                Kxx_lvls = Kxx_lvls + jitter * jnp.eye(N, dtype=Kxx_lvls.dtype)[None]
                diag_sqrt = jnp.sqrt(jnp.diagonal(Kxx_lvls, axis1=-2, axis2=-1))
                Kxx_lvls = Kxx_lvls / (diag_sqrt[:, :, None] * diag_sqrt[:, None, :])
                Kzx_lvls = Kzx_lvls / diag_sqrt[:, None, :]
            out = (
                self._level_scale(cp, Kzz_lvls),
                self._level_scale(cp, Kzx_lvls),
                self._level_scale(cp, Kxx_lvls),
            )
        else:
            if self.low_rank:
                Kxx_diag = self._lr_diag(Phi_X)
            else:
                Kxx_diag = self._K_seq_diag(cp, X_scaled)
            if self.normalization:
                diag_sqrt = jnp.sqrt(Kxx_diag + jitter)
                Kzx_lvls = Kzx_lvls / diag_sqrt[:, None, :]
                Kxx_diag = jnp.tile(sig_var[:, None], (1, N))
            else:
                Kxx_diag = self._level_scale(cp, Kxx_diag)
            out = (
                self._level_scale(cp, Kzz_lvls),
                self._level_scale(cp, Kzx_lvls),
                Kxx_diag,
            )

        if return_levels:
            return out
        return tuple(jnp.sum(o, axis=0) for o in out)

    def K_seq_n_seq_covs(self, params: dict, X, X2, *,
                         full_X2_cov: bool = False,
                         return_levels: bool = False, key=None):
        """Fused Kxx, Kxx2, Kx2x2(-diag) for inducing *sequences*
        (`kernels.py:673-761`; the reference's full_X2_cov branch is broken —
        implemented correctly here)."""
        cp = self.constrain(params)
        X = _as_sequences(X, self.num_features)
        X2 = _as_sequences(X2, self.num_features)
        N1, N2 = X.shape[0], X2.shape[0]
        Xs = self._scale_sequences(cp, X)
        X2s = self._scale_sequences(cp, X2)
        jitter = cfg.jitter()

        if self.low_rank:
            key = jax.random.PRNGKey(0) if key is None else key
            k_s, k_feat = jax.random.split(key)
            nys = self._joint_nystrom_samples(
                k_s, Xs.reshape(-1, Xs.shape[-1]), X2s.reshape(-1, X2s.shape[-1])
            )
            Phi = self._K_seq_lr_feat(cp, k_feat, Xs, nys)
            Phi2 = self._K_seq_lr_feat(cp, k_feat, X2s, nys)
            Kxx_lvls = self._lr_gram(Phi)
            Kxx2_lvls = self._lr_gram(Phi, Phi2)
        else:
            Kxx_lvls = self._K_seq(cp, Xs)
            Kxx2_lvls = self._K_seq(cp, Xs, X2s)

        if self.normalization:
            Kxx_lvls = Kxx_lvls + jitter * jnp.eye(N1, dtype=Kxx_lvls.dtype)[None]
            diag_sqrt = jnp.sqrt(jnp.diagonal(Kxx_lvls, axis1=-2, axis2=-1))
            Kxx_lvls = Kxx_lvls / (diag_sqrt[:, :, None] * diag_sqrt[:, None, :])
            Kxx2_lvls = Kxx2_lvls / diag_sqrt[:, :, None]

        sig_var = cp["sigma"] * cp["variances"]

        if full_X2_cov:
            if self.low_rank:
                Kx2_lvls = self._lr_gram(Phi2)
            else:
                Kx2_lvls = self._K_seq(cp, X2s)
            if self.normalization:
                Kx2_lvls = Kx2_lvls + jitter * jnp.eye(N2, dtype=Kx2_lvls.dtype)[None]
                d2_sqrt = jnp.sqrt(jnp.diagonal(Kx2_lvls, axis1=-2, axis2=-1))
                Kx2_lvls = Kx2_lvls / (d2_sqrt[:, :, None] * d2_sqrt[:, None, :])
                Kxx2_lvls = Kxx2_lvls / d2_sqrt[:, None, :]
            out = (
                self._level_scale(cp, Kxx_lvls),
                self._level_scale(cp, Kxx2_lvls),
                self._level_scale(cp, Kx2_lvls),
            )
        else:
            if self.low_rank:
                Kx2_diag = self._lr_diag(Phi2)
            else:
                Kx2_diag = self._K_seq_diag(cp, X2s)
            if self.normalization:
                d2_sqrt = jnp.sqrt(Kx2_diag + jitter)
                Kxx2_lvls = Kxx2_lvls / d2_sqrt[:, None, :]
                Kx2_diag = jnp.tile(sig_var[:, None], (1, N2))
            else:
                Kx2_diag = self._level_scale(cp, Kx2_diag)
            out = (
                self._level_scale(cp, Kxx_lvls),
                self._level_scale(cp, Kxx2_lvls),
                Kx2_diag,
            )

        if return_levels:
            return out
        return tuple(jnp.sum(o, axis=0) for o in out)


# ---------------------------------------------------------------------------
# named variants mirroring the reference's subclasses (`kernels.py:786-994`)
# ---------------------------------------------------------------------------


def _variant(name: str, base: str, **default_opts):
    def ctor(num_features, num_levels, **kwargs):
        opts = dict(default_opts)
        opts.update(kwargs.pop("base_options", {}) or {})
        # variant-specific kwargs routed into base_options
        for k in list(kwargs):
            if k in ("gamma", "degree", "Q", "family"):
                v = kwargs.pop(k)
                if k == "gamma":
                    opts["poly_gamma"] = v
                elif k == "degree":
                    opts["poly_degree"] = v
                else:
                    opts[k] = v
        b = base
        if base == "spectral":
            family = opts.pop("family", "rbf")
            fam = {"exp": "exp", "exponential": "exp", "gauss": "rbf",
                   "gaussian": "rbf", "rbf": "rbf", "mix": "mixed",
                   "mixed": "mixed"}.get(family)
            if fam is None:
                raise ValueError(f"Unrecognized spectral family {family!r}")
            b = f"spectral_{fam}"
            kwargs.setdefault("lengthscales", None)
        return SignatureKernel(
            num_features, num_levels, base=b, base_options=opts, **kwargs
        )

    ctor.__name__ = name
    ctor.__qualname__ = name
    ctor.__doc__ = f"SignatureKernel with the {base!r} state-space embedding."
    return ctor


SignatureLinear = _variant("SignatureLinear", "linear")
SignatureCosine = _variant("SignatureCosine", "cosine")
SignaturePoly = _variant("SignaturePoly", "poly")
SignatureRBF = _variant("SignatureRBF", "rbf")
SignatureGauss = SignatureRBF
SignatureMix = _variant("SignatureMix", "mix")
SignatureSpectral = _variant("SignatureSpectral", "spectral")
SignatureMatern12 = _variant("SignatureMatern12", "matern12")
SignatureLaplace = SignatureMatern12
SignatureExponential = SignatureMatern12
SignatureMatern32 = _variant("SignatureMatern32", "matern32")
SignatureMatern52 = _variant("SignatureMatern52", "matern52")
