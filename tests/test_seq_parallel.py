"""Sequence parallelism: chunked-time recursions == single-device results."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpsig_tpu.ops import signature as sig_ops
from gpsig_tpu.parallel import seq_parallel

RNG = np.random.RandomState(21)


def _seq_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("seq",))


class TestTensVsSeqSP:
    def test_matches_single_device(self):
        M_lvls, nT, N, L = 4, 5, 6, 33  # L-1 = 32, divisible by 8 chunks
        len_tensors = M_lvls * (M_lvls + 1) // 2
        Z = RNG.randn(len_tensors, nT, 2)
        X = RNG.randn(N, L, 2) / np.sqrt(L)
        M_pts = jnp.asarray(np.einsum("kid,nld->kinl", Z, X))
        ref = sig_ops.signature_kern_tens_vs_seq_first_order(M_pts, M_lvls)

        M_inc = M_pts[..., 1:] - M_pts[..., :-1]
        mesh = _seq_mesh()
        M_inc_sharded = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, None, "seq"))
        )
        out = seq_parallel.tens_vs_seq_levels_seq_parallel(
            mesh, M_inc_sharded, M_lvls
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)

    def test_jits_under_mesh(self):
        M_lvls, nT, N, L = 3, 4, 5, 17  # L-1 = 16
        len_tensors = M_lvls * (M_lvls + 1) // 2
        Z = RNG.randn(len_tensors, nT, 2)
        X = RNG.randn(N, L, 2)
        M_pts = jnp.asarray(np.einsum("kid,nld->kinl", Z, X))
        M_inc = M_pts[..., 1:] - M_pts[..., :-1]
        mesh = _seq_mesh()
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, None, "seq"))
        )
        f = jax.jit(
            lambda m: seq_parallel.tens_vs_seq_levels_seq_parallel(
                mesh, m, M_lvls
            )
        )
        ref = sig_ops.signature_kern_tens_vs_seq_first_order(M_pts, M_lvls)
        np.testing.assert_allclose(np.asarray(f(M_inc_s)), np.asarray(ref),
                                   rtol=1e-10)


class TestSeqDiagSP:
    def test_matches_single_device(self):
        M_lvls, N, L = 4, 5, 25  # L-1 = 24, 8 chunks of 3
        X = RNG.randn(N, L, 3) / np.sqrt(L)
        M3 = jnp.asarray(np.einsum("nld,nsd->nls", X, X))
        ref = sig_ops.signature_kern_first_order(M3, M_lvls)

        M_inc = (
            M3[:, 1:, 1:] + M3[:, :-1, :-1] - M3[:, :-1, 1:] - M3[:, 1:, :-1]
        )
        mesh = _seq_mesh()
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, "seq"))
        )
        out = seq_parallel.seq_diag_levels_seq_parallel(mesh, M_inc_s, M_lvls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)

    def test_long_sequence_memory_split(self):
        # each device only holds an L/8 stripe of the (L, L) Grams
        M_lvls, N, L = 3, 2, 65
        X = RNG.randn(N, L, 2) / np.sqrt(L)
        M3 = jnp.asarray(np.einsum("nld,nsd->nls", X, X))
        ref = sig_ops.signature_kern_first_order(M3, M_lvls)
        M_inc = (
            M3[:, 1:, 1:] + M3[:, :-1, :-1] - M3[:, :-1, 1:] - M3[:, 1:, :-1]
        )
        mesh = _seq_mesh()
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, "seq"))
        )
        shard_shapes = {s.data.shape for s in M_inc_s.addressable_shards}
        assert shard_shapes == {(N, L - 1, (L - 1) // 8)}
        out = seq_parallel.seq_diag_levels_seq_parallel(mesh, M_inc_s, M_lvls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)


class TestSeqCrossSP:
    """Full (L1, L2) cross-Gram recursion with BOTH time axes chunked."""

    def _mesh2d(self, shape=(2, 4)):
        devs = np.asarray(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
        return Mesh(devs, axis_names=("seq1", "seq2"))

    def _case(self, M_lvls, N1, N2, L1, L2, mesh_shape=(2, 4)):
        X = RNG.randn(N1, L1, 2) / np.sqrt(L1)
        X2 = RNG.randn(N2, L2, 2) / np.sqrt(L2)
        M4 = jnp.asarray(np.einsum("nld,msd->nlms", X, X2))
        ref = sig_ops.signature_kern_first_order(M4, M_lvls)
        M_inc = (
            M4[:, 1:, :, 1:] + M4[:, :-1, :, :-1]
            - M4[:, :-1, :, 1:] - M4[:, 1:, :, :-1]
        )
        mesh = self._mesh2d(mesh_shape)
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, "seq1", None, "seq2"))
        )
        out = seq_parallel.seq_cross_levels_seq_parallel(
            mesh, M_inc_s, M_lvls
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10)
        return mesh, M_inc_s

    def test_matches_single_device(self):
        self._case(M_lvls=4, N1=4, N2=3, L1=17, L2=33)  # chunks 8 and 8

    def test_uneven_axes_and_jit(self):
        M_lvls, N1, N2, L1, L2 = 3, 3, 2, 9, 13  # L-1 = 8, 12 over (4, 2)
        X = RNG.randn(N1, L1, 2)
        X2 = RNG.randn(N2, L2, 2)
        M4 = jnp.asarray(np.einsum("nld,msd->nlms", X, X2))
        ref = sig_ops.signature_kern_first_order(M4, M_lvls)
        M_inc = (
            M4[:, 1:, :, 1:] + M4[:, :-1, :, :-1]
            - M4[:, :-1, :, 1:] - M4[:, 1:, :, :-1]
        )
        mesh = self._mesh2d((4, 2))
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, "seq1", None, "seq2"))
        )
        f = jax.jit(
            lambda m: seq_parallel.seq_cross_levels_seq_parallel(
                mesh, m, M_lvls
            )
        )
        np.testing.assert_allclose(np.asarray(f(M_inc_s)), np.asarray(ref),
                                   rtol=1e-10)

    def test_blocks_are_distributed(self):
        mesh, M_inc_s = self._case(M_lvls=2, N1=2, N2=2, L1=17, L2=17,
                                   mesh_shape=(2, 4))
        shard_shapes = {s.data.shape for s in M_inc_s.addressable_shards}
        assert shard_shapes == {(2, 8, 2, 4)}
