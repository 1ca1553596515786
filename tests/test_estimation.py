"""Estimation tests: Kalman filter/smoother against an independent numpy
implementation, sigma-point moments against exact Gaussian identities, UKF
consistency on the pendulum system."""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.estimation import (
    LGSSM,
    default_sigma_points,
    kalman_filter,
    kalman_smooth,
    make_pendulum_ukf,
    make_sigma_points,
    moments,
    ukf_filter,
    ukf_smoother,
)


def make_model():
    A = np.array([[1.0, 0.1], [0.0, 0.95]], np.float32)
    a = np.array([0.0, 0.01], np.float32)
    B = np.array([[0.0], [0.1]], np.float32)
    C = np.array([[1.0, 0.0]], np.float32)
    Qn = 0.01 * np.eye(2, dtype=np.float32)
    Rn = 0.04 * np.eye(1, dtype=np.float32)
    return LGSSM(*(jnp.asarray(m) for m in (A, a, B, C, Qn, Rn))), (A, a, B, C, Qn, Rn)


def np_kalman(A, a, B, C, Qn, Rn, mu0, sig0, us, ys):
    mu, sig = mu0.copy(), sig0.copy()
    mus, sigs, mups, sigps = [mu0], [sig0], [], []
    for u, y in zip(us, ys):
        mu = A @ mu + a + B @ u
        sig = A @ sig @ A.T + Qn
        mups.append(mu.copy())
        sigps.append(sig.copy())
        S = C @ sig @ C.T + Rn
        L = sig @ C.T @ np.linalg.pinv(S)
        mu = mu + L @ (y - C @ mu)
        sig = (np.eye(2) - L @ C) @ sig
        mus.append(mu.copy())
        sigs.append(sig.copy())
    return np.array(mus), np.array(sigs), np.array(mups), np.array(sigps)


def simulate(A, a, B, C, Qn, Rn, x0, us, rng):
    xs, ys = [x0], []
    x = x0
    for u in us:
        x = A @ x + a + B @ u + rng.multivariate_normal(np.zeros(2), Qn)
        ys.append(C @ x + rng.multivariate_normal(np.zeros(1), Rn))
        xs.append(x)
    return np.array(xs), np.array(ys)


def test_kalman_filter_matches_numpy():
    model, (A, a, B, C, Qn, Rn) = make_model()
    rng = np.random.default_rng(0)
    N = 30
    us = rng.uniform(-1, 1, (N, 1)).astype(np.float32)
    x0 = np.array([1.0, 0.0], np.float32)
    _, ys = simulate(A, a, B, C, Qn, Rn, x0, us, rng)
    mu0 = np.zeros(2, np.float32)
    sig0 = np.eye(2, dtype=np.float32)

    fr = kalman_filter(model, jnp.asarray(mu0), jnp.asarray(sig0),
                       jnp.asarray(us), jnp.asarray(ys, dtype=jnp.float32))
    w_mu, w_sig, w_mup, w_sigp = np_kalman(A, a, B, C, Qn, Rn, mu0, sig0, us, ys)
    np.testing.assert_allclose(np.asarray(fr.mu_filt), w_mu, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fr.sig_filt), w_sig, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fr.mu_pred), w_mup, rtol=1e-3, atol=1e-4)


def test_smoother_matches_numpy_rts():
    model, (A, a, B, C, Qn, Rn) = make_model()
    rng = np.random.default_rng(1)
    N = 60
    us = rng.uniform(-1, 1, (N, 1)).astype(np.float32)
    x0 = np.array([0.5, -0.2], np.float32)
    xs, ys = simulate(A, a, B, C, Qn, Rn, x0, us, rng)
    mu0, sig0 = np.zeros(2, np.float32), np.eye(2, dtype=np.float32)
    fr = kalman_filter(model, jnp.asarray(mu0), jnp.asarray(sig0),
                       jnp.asarray(us), jnp.asarray(ys, np.float32))
    sm = kalman_smooth(model, jnp.asarray(mu0), jnp.asarray(sig0),
                       jnp.asarray(us), jnp.asarray(ys, np.float32))

    # independent numpy RTS
    w_mu, w_sig, w_mup, w_sigp = np_kalman(A, a, B, C, Qn, Rn, mu0, sig0, us, ys)
    mu_s = [w_mu[-1]]
    sig_s = [w_sig[-1]]
    for t in range(N - 1, -1, -1):
        J = w_sig[t] @ A.T @ np.linalg.inv(w_sigp[t])
        mu_s.insert(0, w_mu[t] + J @ (mu_s[0] - w_mup[t]))
        sig_s.insert(0, w_sig[t] + J @ (sig_s[0] - w_sigp[t]) @ J.T)
    np.testing.assert_allclose(np.asarray(sm.mu_smooth), np.array(mu_s), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sm.sig_smooth), np.array(sig_s), atol=1e-4)

    # smoothing must improve the observed coordinate on this path
    err_filt = np.mean((np.asarray(fr.mu_filt)[:, 0] - xs[:, 0]) ** 2)
    err_smooth = np.mean((np.asarray(sm.mu_smooth)[:, 0] - xs[:, 0]) ** 2)
    assert err_smooth < err_filt
    # smoother endpoint equals filter endpoint
    np.testing.assert_allclose(
        np.asarray(sm.mu_smooth[-1]), np.asarray(fr.mu_filt[-1]), rtol=1e-5
    )


def test_sigma_points_exact_for_linear_gaussian():
    """Unscented moments of a linear map must be exact."""
    sp = make_sigma_points(1.0, 0.0, 0.0, 2)
    M = jnp.array([[2.0, 1.0], [0.0, 3.0]], jnp.float32)
    b = jnp.array([0.5, -1.0], jnp.float32)
    m_x = jnp.array([1.0, 2.0], jnp.float32)
    sig_x = jnp.array([[0.3, 0.1], [0.1, 0.4]], jnp.float32)
    m_y, sig_y, sig_xy = moments(sp, lambda pts: pts @ M.T + b, m_x, sig_x)
    np.testing.assert_allclose(np.asarray(m_y), np.asarray(M @ m_x + b), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sig_y), np.asarray(M @ sig_x @ M.T), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig_xy), np.asarray(sig_x @ M.T), rtol=1e-3, atol=1e-5)


def test_ukf_tracks_pendulum():
    model = make_pendulum_ukf(process_std=1e-3, obs_std=0.05)
    sp = default_sigma_points(2)
    rng = np.random.default_rng(2)
    N = 80
    x = np.array([0.8, 0.0], np.float32)
    us = np.zeros((N, 1), np.float32)
    xs, ys = [x], []
    for t in range(N):
        x = np.asarray(model.dynamics(jnp.asarray(x[None]), jnp.asarray(us[t]))[0])
        xs.append(x)
        y = np.asarray(model.observe(jnp.asarray(x[None]))[0])
        ys.append(y + 0.05 * rng.standard_normal(2))
    xs, ys = np.array(xs), np.array(ys, np.float32)

    mu0 = jnp.array([0.0, 0.0], jnp.float32)
    sig0 = jnp.eye(2, dtype=jnp.float32)
    fr = ukf_filter(model, sp, mu0, sig0, jnp.asarray(us), jnp.asarray(ys))
    err0 = np.abs(np.asarray(fr.mu_filt[0, 0]) - xs[0, 0])
    err_late = np.abs(np.asarray(fr.mu_filt[-20:, 0]) - xs[-20:, 0]).mean()
    assert err_late < 0.1, (err0, err_late)
    sm = ukf_smoother(model, sp, fr, jnp.asarray(us))
    err_smooth = np.abs(np.asarray(sm.mu_smooth[-20:, 0]) - xs[-20:, 0]).mean()
    assert np.isfinite(err_smooth)


def test_filter_jits_and_vmaps():
    model, _ = make_model()
    N, Bt = 10, 4
    rng = np.random.default_rng(3)
    us = jnp.float32(rng.uniform(-1, 1, (Bt, N, 1)))
    ys = jnp.float32(rng.uniform(-1, 1, (Bt, N, 1)))
    mu0 = jnp.zeros((Bt, 2))
    sig0 = jnp.tile(jnp.eye(2), (Bt, 1, 1))
    fn = jax.jit(jax.vmap(lambda m, s, u, y: kalman_filter(model, m, s, u, y)))
    fr = fn(mu0, sig0, us, ys)
    assert fr.mu_filt.shape == (Bt, N + 1, 2)
    assert np.all(np.isfinite(np.asarray(fr.mu_filt)))
