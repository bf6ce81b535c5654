"""SVGP variants: unwhitened VI, diagonal q_sqrt, checkpointed training."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gpsig_tpu import (
    SVGP, InducingTensors, checkpoint, kernels, likelihoods, training,
    utils as gp_utils,
)

RNG = np.random.RandomState(31)


def _setup(whiten=True, q_diag=False, n=24, L=10, d=2, M=2, n_ind=8):
    X = RNG.randn(n, L, d)
    y = (X[:, :, 0].mean(axis=1) > 0).astype(np.float64)
    Z = gp_utils.suggest_initial_inducing_tensors(X, M, n_ind, seed=0)
    kern = kernels.SignatureRBF(d, M)
    ind = InducingTensors(Z, M)
    model = SVGP(kern, ind, likelihoods.Bernoulli(), num_latent=1,
                 num_data=n, whiten=whiten, q_diag=q_diag)
    return model, model.init_params(), jnp.asarray(X), jnp.asarray(y[:, None])


def test_unwhitened_elbo_trains():
    model, params, X, Y = _setup(whiten=False)
    e0 = float(model.elbo(params, X, Y))
    assert np.isfinite(e0)
    opt = optax.nadam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(model.loss)(p, X, Y)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    p, s = params, state
    for _ in range(30):
        p, s, loss = step(p, s)
    assert float(model.elbo(p, X, Y)) > e0


def test_whitened_and_unwhitened_agree_at_init():
    # with q_mu = 0 and q_sqrt = I, whitened and unwhitened predictions both
    # reduce to the prior mean 0 with prior variances
    m_w, p_w, X, Y = _setup(whiten=True)
    m_u, p_u, _, _ = _setup(whiten=False)
    mean_w, _ = m_w.predict_f(p_w, X)
    mean_u, _ = m_u.predict_f(p_u, X)
    np.testing.assert_allclose(np.asarray(mean_w), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mean_u), 0.0, atol=1e-12)


def test_q_diag_paths():
    model, params, X, Y = _setup(q_diag=True)
    assert params["q_sqrt"].ndim == 2
    e = float(model.elbo(params, X, Y))
    assert np.isfinite(e)
    g = jax.grad(lambda p: model.loss(p, X, Y))(params)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))
    # q_diag with identity q_sqrt matches full q_sqrt at init
    m_full, p_full, _, _ = _setup(q_diag=False)
    np.testing.assert_allclose(
        float(m_full.elbo(p_full, X, Y)), e, rtol=1e-10
    )


def test_checkpointed_training(tmp_path):
    model, params, X, Y = _setup()
    path = str(tmp_path / "run.ckpt")
    opt = optax.nadam(1e-2)
    hist = training.optimize(
        lambda p, x, y: model.loss(p, x, y), params, opt,
        max_iter=6, data_iter=iter(lambda: (X, Y), None),
        save_freq=3, print_freq=100, checkpoint_path=path,
        checkpoint_extra={"phase": np.asarray(2)},
    )
    assert os.path.exists(path)
    mask = jax.tree.map(lambda _: True, params)
    like = {
        "params": params,
        "opt_state": training.masked_optimizer(opt, mask).init(params),
        "iter": np.asarray(0),
        "extra": {"phase": np.asarray(0)},
    }
    restored = checkpoint.restore(path, like)
    assert int(restored["iter"]) == 6
    assert int(restored["extra"]["phase"]) == 2
    # optimizer moments are saved too (SURVEY §5: params + opt state + iter)
    assert any(
        np.any(np.asarray(leaf) != 0)
        for leaf in jax.tree.leaves(restored["opt_state"])
    )
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(hist["final_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_legacy_checkpoint_resumes_with_defaults(tmp_path):
    """A checkpoint written by an older build (no best/early-stop fields)
    still resumes — the missing schema keys fill from the template — and a
    checkpoint with an incompatible param tree raises a clear error rather
    than a bare flax KeyError."""
    model, params, X, Y = _setup()
    opt = optax.nadam(1e-2)
    mask = jax.tree.map(lambda _: True, params)
    legacy_opt_state = training.masked_optimizer(opt, mask).init(params)
    path = str(tmp_path / "legacy.ckpt")
    checkpoint.save(path, {
        "params": params, "opt_state": legacy_opt_state,
        "iter": np.asarray(4), "phase_start": np.asarray(0),
    })
    hist = training.optimize(
        lambda p, x, y: model.loss(p, x, y), params, opt,
        max_iter=8, data_iter=iter(lambda: (X, Y), None),
        print_freq=100, resume_from=path,
    )
    assert [k for k in hist if isinstance(k, int)]  # trained 5..8
    bad = str(tmp_path / "bad.ckpt")
    checkpoint.save(bad, {
        "params": {"not": np.zeros(3)}, "opt_state": legacy_opt_state,
        "iter": np.asarray(4), "phase_start": np.asarray(0),
    })
    with pytest.raises(ValueError, match="incompatible"):
        training.optimize(
            lambda p, x, y: model.loss(p, x, y), params, opt,
            max_iter=8, data_iter=iter(lambda: (X, Y), None),
            print_freq=100, resume_from=bad,
        )


def test_minibatch_stream_state_roundtrip():
    s1 = training.MinibatchStream(17, 5, seed_or_rng=3)
    for _ in range(4):  # advance into the second permutation
        next(s1)
    state = s1.state()
    expected = [np.asarray(next(s1)) for _ in range(6)]
    s2 = training.MinibatchStream(17, 5, seed_or_rng=999)  # wrong seed
    s2.set_state(state)
    got = [np.asarray(next(s2)) for _ in range(6)]
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(a, b)


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    """A killed run resumed from disk (fresh process simulation: new
    optimizer instance, new data stream) continues with identical optimizer
    moments and data order — the loss trajectory and final params match the
    uninterrupted run exactly (VERDICT round-2 item 4)."""
    model, params, X, Y = _setup(n=20)
    Xn, Yn = np.asarray(X), np.asarray(Y)
    batch = 5

    def make_iter(stream):
        return training.BatchIterator(
            stream, batch_fn=lambda idx: (jnp.asarray(Xn[idx]),
                                          jnp.asarray(Yn[idx]))
        )

    def loss_fn(p, xb, yb):
        return model.loss(p, xb, yb)

    # uninterrupted run: 12 iters
    hist_a = training.optimize(
        loss_fn, params, optax.nadam(1e-2), max_iter=12,
        data_iter=make_iter(training.MinibatchStream(20, batch, 7)),
        save_freq=2, print_freq=100,
    )

    # interrupted run: dies after 6 iters (checkpoint every 2)
    path = str(tmp_path / "crash.ckpt")
    training.optimize(
        loss_fn, params, optax.nadam(1e-2), max_iter=6,
        data_iter=make_iter(training.MinibatchStream(20, batch, 7)),
        save_freq=2, print_freq=100, checkpoint_path=path,
    )
    # ...fresh process: brand-new optimizer + stream, resume to iter 12
    hist_b = training.optimize(
        loss_fn, params, optax.nadam(1e-2), max_iter=12,
        data_iter=make_iter(training.MinibatchStream(20, batch, 0)),
        save_freq=2, print_freq=100, resume_from=path,
    )

    for a, b in zip(jax.tree.leaves(hist_a["final_params"]),
                    jax.tree.leaves(hist_b["final_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # post-resume loss snapshots coincide with the uninterrupted ones
    for it in (8, 10, 12):
        assert hist_a[it]["loss"] == hist_b[it]["loss"]


def test_nan_debug_toggle():
    from gpsig_tpu import config as cfg

    cfg.enable_nan_debugging(True)
    assert jax.config.jax_debug_nans
    cfg.enable_nan_debugging(False)
    assert not jax.config.jax_debug_nans


def test_jit_determinism():
    """Two identical jitted ELBO+grad evaluations are bitwise equal
    (SURVEY.md §5: jit-level determinism in place of race detection)."""
    model, params, X, Y = _setup(n=12, L=8)
    f = jax.jit(jax.value_and_grad(lambda p: model.loss(p, X, Y)))
    l1, g1 = f(params)
    l2, g2 = f(params)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_restores_best_and_early_stop(tmp_path):
    """Checkpoints carry the best-on-validation snapshot and the patience/
    early-stop state: a resumed run picks the same restore_best() params as
    the uninterrupted run, and a run killed after early-stopping does not
    train further on resume."""
    model, params, X, Y = _setup(n=20)
    Xn, Yn = np.asarray(X), np.asarray(Y)

    def make_iter(stream):
        return training.BatchIterator(
            stream, batch_fn=lambda idx: (jnp.asarray(Xn[idx]),
                                          jnp.asarray(Yn[idx]))
        )

    def loss_fn(p, xb, yb):
        return model.loss(p, xb, yb)

    # an adversarial scorer that peaks early, so 'best' != final params
    calls = {"n": 0}

    def val_scorer(p):
        calls["n"] += 1
        return [1.0, 10.0 - calls["n"]]  # strictly decreasing after iter 2

    common = dict(max_iter=12, save_freq=2, print_freq=100,
                  val_scorer=val_scorer, save_best_params=True)

    hist_a = training.optimize(
        loss_fn, params, optax.nadam(1e-2),
        data_iter=make_iter(training.MinibatchStream(20, 5, 7)), **common,
    )

    calls["n"] = 0
    path = str(tmp_path / "crash.ckpt")
    training.optimize(
        loss_fn, params, optax.nadam(1e-2), checkpoint_path=path,
        data_iter=make_iter(training.MinibatchStream(20, 5, 7)),
        **{**common, "max_iter": 6},
    )
    # fresh process: history dict is EMPTY — best must come from the file
    calls["n"] = 3  # scorer state as the uninterrupted run would have it
    hist_b = training.optimize(
        loss_fn, params, optax.nadam(1e-2), resume_from=path,
        data_iter=make_iter(training.MinibatchStream(20, 5, 0)), **common,
    )
    assert hist_b["best"]["iter"] == hist_a["best"]["iter"] == 2
    assert hist_b["best"]["val"] == hist_a["best"]["val"]
    ba = training.restore_best(params, hist_a)
    bb = training.restore_best(params, hist_b)
    for a, b in zip(jax.tree.leaves(ba), jax.tree.leaves(bb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # early stop trips at iter 8 (best iter 2, patience 5 -> 8-2 > 5);
    # killed-after-stop + resume must NOT continue training
    calls["n"] = 0
    path2 = str(tmp_path / "stopped.ckpt")
    hist_c = training.optimize(
        loss_fn, params, optax.nadam(1e-2), checkpoint_path=path2,
        data_iter=make_iter(training.MinibatchStream(20, 5, 7)),
        patience=5, **common,
    )
    last_c = max(k for k in hist_c if isinstance(k, int))
    hist_d = training.optimize(
        loss_fn, params, optax.nadam(1e-2), resume_from=path2,
        data_iter=make_iter(training.MinibatchStream(20, 5, 0)),
        patience=5, **common,
    )
    assert last_c == 8  # stop tripped at iter 8
    assert not [k for k in hist_d if isinstance(k, int)]  # trained 0 iters
    for a, b in zip(jax.tree.leaves(hist_c["final_params"]),
                    jax.tree.leaves(hist_d["final_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
