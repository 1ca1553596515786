"""Seeded numpy replicas of the reference solvers, for the <1e-3 parity gate.

The reference package (gym + numdifftools + multiprocessing) is not
installable in this offline environment, so the BASELINE control-error gate
("control error < 1e-3 vs reference solvers at identical horizons") is
evidenced against faithful numpy re-implementations of the reference's
behavior, written from a close reading of:

- ``MPCBenchmark/agents/agent.py:30-108``  (predict_action / warm_start /
  simulate_trajectory: goal tiling, clip, log, receding-horizon roll(-1))
- ``MPCBenchmark/agents/cem.py:54-78``     (CEM outer loop)
- ``MPCBenchmark/agents/mppi.py:36-75``    (MPPI weighting + update)
- ``MPCBenchmark/agents/ilqr.py:119-350``  (iLQR outer loop, diag-Hessian
  derivatives, vector-V_xx backward pass, line search, mu/delta schedule)
- ``MPCBenchmark/models/model.py:26-44``   (cost-before-step predict contract)

Substitutions (the only deliberate deltas, both numerical not semantic):
- ``numdifftools`` Jacobian/Hessian -> fixed-step central finite differences
  (the technique validated against autodiff in ``scripts/difftools.py``).
- ``multiprocessing.Pool.map`` -> plain Python loops (bit-identical math).

Randomness is *injected*: the replicas draw their Gaussians from the same
``jax.random`` streams the framework solvers use (converted to numpy), so a
control-trajectory comparison isolates the solver outer-loop logic instead
of RNG differences. All arithmetic is float64.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# numpy models: predict(x, u, g_z_row) -> (cost at (x,u), next state)
# (the reference Model.predict contract, models/model.py:26-44)
# ---------------------------------------------------------------------------


class NpModel:
    """Reference-semantics model: quadratic feature cost + dynamics step."""

    name = "np_model"
    state_size = 0
    action_size = 1
    bounds_low = np.array([-1.0])
    bounds_high = np.array([1.0])

    def transform(self, x, u):
        raise NotImplementedError

    def dynamics(self, x, u):
        raise NotImplementedError

    W = None  # stage-cost weight on features
    W_T = None  # terminal-cost weight

    def state_cost(self, z, g):
        zd = z - g
        return float(zd @ self.W @ zd)

    def terminal_cost(self, z, g):
        zd = z - g
        return float(zd @ self.W_T @ zd)

    def predict(self, x, u, g):
        """cost of current (x, u), then step — ``model.py:26-44``."""
        z = self.transform(x, u)
        return self.state_cost(z, g), self.dynamics(x, u)


def _angle_normalize(a):
    return ((a + np.pi) % (2.0 * np.pi)) - np.pi


class NpPendulum(NpModel):
    """``MPCBenchmark/models/pendulum_model.py:7-59`` semantics."""

    name = "pendulum"
    state_size = 2
    bounds_low = np.array([-2.0])
    bounds_high = np.array([2.0])
    W = np.diag([1.0, 0.1, 0.001])
    W_T = np.diag([1.0, 2.0, 0.0])

    def transform(self, x, u):
        return -np.array([_angle_normalize(x[0]), x[1], u[0]])

    def dynamics(self, x, u):
        g, m, l, dt = 10.0, 1.0, 1.0, 0.05
        torque = np.clip(u[0], -2.0, 2.0)
        th, thdot = x
        newthdot = thdot + (
            -3.0 * g / (2.0 * l) * np.sin(th + np.pi) + 3.0 / (m * l**2) * torque
        ) * dt
        newth = th + newthdot * dt  # unclipped thdot, pendulum_model.py:28-38
        return np.array([newth, np.clip(newthdot, -8.0, 8.0)])


class NpCartPole(NpModel):
    """``MPCBenchmark/models/cartpole_swingup_model.py:15-110`` semantics
    (the stage cost's double negation nets to the positive quadratic; the
    terminal W_t keeps the reference's negative sign verbatim)."""

    name = "cartpole_swingup"
    state_size = 4
    bounds_low = np.array([-1.0])
    bounds_high = np.array([1.0])
    W = np.diag([1.0, 0.0, 5.0, 0.0, 0.0])
    W_T = np.diag([-5.0, 0.0, -10.0, 0.0, 0.0])

    def transform(self, x, u):
        xc = (x[0] / 2.4) ** 2 + (x[0] / 2.4) ** 10
        return np.array([xc, x[1], 1.0 - np.cos(x[2]), x[3], u[0]])

    def dynamics(self, x, u):
        g, m_c, m_p, l, dt, b = 9.82, 0.5, 0.5, 0.6, 0.05, 0.1
        total_m, m_p_l = m_c + m_p, m_p * l
        a = np.clip(u[0], -1.0, 1.0) * 10.0
        xc, x_dot, th, th_dot = x
        s, c = np.sin(th), np.cos(th)
        xdot_up = (
            -2 * m_p_l * th_dot**2 * s + 3 * m_p * g * s * c + 4 * a - 4 * b * x_dot
        ) / (4 * total_m - 3 * m_p * c**2)
        thdot_up = (
            -3 * m_p_l * th_dot**2 * s * c + 6 * total_m * g * s + 6 * (a - b * x_dot) * c
        ) / (4 * l * total_m - 3 * m_p_l * c**2)
        return np.array(
            [xc + x_dot * dt, x_dot + xdot_up * dt, th + th_dot * dt, th_dot + thdot_up * dt]
        )


class NpAcrobot(NpModel):
    """``MPCBenchmark/models/acrobot_model.py:19-282`` semantics (RK4, book
    variant, modular wrap / velocity bound)."""

    name = "acrobot"
    state_size = 4
    bounds_low = np.array([-1.0])
    bounds_high = np.array([1.0])
    W = np.diag([1.0, 0.0, 0.0, 0.0, 0.0])
    W_T = W

    def transform(self, x, u):
        tip = -np.cos(x[0]) - np.cos(x[1] + x[0]) - 2.0
        return np.array([tip, 0.0, 0.0, 0.0, u[0]])

    @staticmethod
    def _dsdt(s, a):
        m1 = m2 = 1.0
        l1, lc1, lc2 = 1.0, 0.5, 0.5
        i1 = i2 = 1.0
        g = 9.8
        t1, t2, dt1, dt2 = s
        d1 = m1 * lc1**2 + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * np.cos(t2)) + i1 + i2
        d2 = m2 * (lc2**2 + l1 * lc2 * np.cos(t2)) + i2
        phi2 = m2 * lc2 * g * np.cos(t1 + t2 - np.pi / 2)
        phi1 = (
            -m2 * l1 * lc2 * dt2**2 * np.sin(t2)
            - 2 * m2 * l1 * lc2 * dt2 * dt1 * np.sin(t2)
            + (m1 * lc1 + m2 * l1) * g * np.cos(t1 - np.pi / 2)
            + phi2
        )
        dd2 = (a + d2 / d1 * phi1 - m2 * l1 * lc2 * dt1**2 * np.sin(t2) - phi2) / (
            m2 * lc2**2 + i2 - d2**2 / d1
        )
        dd1 = -(d2 * dd2 + phi1) / d1
        return np.array([dt1, dt2, dd1, dd2])

    def dynamics(self, x, u):
        dt = 0.2
        a = u[0]
        k1 = self._dsdt(x, a)
        k2 = self._dsdt(x + dt / 2 * k1, a)
        k3 = self._dsdt(x + dt / 2 * k2, a)
        k4 = self._dsdt(x + dt * k3, a)
        ns = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return np.array(
            [
                _angle_normalize(ns[0]),
                _angle_normalize(ns[1]),
                np.clip(ns[2], -4 * np.pi, 4 * np.pi),
                np.clip(ns[3], -9 * np.pi, 9 * np.pi),
            ]
        )


NP_MODELS = {"pendulum": NpPendulum(), "cartpole_swingup": NpCartPole(),
             "acrobot": NpAcrobot()}


# ---------------------------------------------------------------------------
# agent layer (agents/agent.py:30-108)
# ---------------------------------------------------------------------------


class ReplicaAgent:
    def __init__(self, model: NpModel, T: int):
        self.model = model
        self.T = T
        self.planned_us = np.zeros((T, model.action_size))

    def _calc_action(self, x, g_z):
        raise NotImplementedError

    def simulate_trajectory(self, x, us, g_z):
        """states + total cost (``agent.py:97-108``)."""
        xs = np.zeros((self.T + 1, self.model.state_size))
        xs[0] = x
        total = 0.0
        for t in range(self.T):
            c, xs[t + 1] = self.model.predict(xs[t], us[t], g_z[t])
            total += c
        return xs, total

    def predict_action(self, x, g_z):
        """clip plan -> simulate -> roll(-1)+zero -> clip u0
        (``agent.py:50-76`` with logging=True, the Experiment default)."""
        m = self.model
        u0 = self._calc_action(x, g_z)
        self.planned_us = np.clip(self.planned_us, m.bounds_low, m.bounds_high)
        self.simulate_trajectory(x, self.planned_us, g_z)  # logging rollout
        self.planned_us = np.roll(self.planned_us, -1, axis=0)
        self.planned_us[-1] = 0.0
        return np.clip(u0, m.bounds_low, m.bounds_high)

    def warm_start(self, x, n_iter, g_z):
        """n_iter solver calls with clip but no shift (``agent.py:30-48``)."""
        for _ in range(n_iter):
            self._calc_action(x, g_z)
            self.planned_us = np.clip(
                self.planned_us, self.model.bounds_low, self.model.bounds_high
            )


# ---------------------------------------------------------------------------
# CEM (agents/cem.py:54-78)
# ---------------------------------------------------------------------------


class ReplicaCEM(ReplicaAgent):
    def __init__(self, model, T, K, max_iter, n_elite, epsilon, alpha, std,
                 noise_fn):
        """``noise_fn(i) -> (K, T, A)`` standard-normal draws for refinement
        iteration i of the *current* call — injected so the replica consumes
        the same stream as the framework solver."""
        super().__init__(model, T)
        self.K, self.max_iter, self.n_elite = K, max_iter, n_elite
        self.epsilon, self.alpha = epsilon, alpha
        self.std0 = np.ones((T, model.action_size)) * std
        self.noise_fn = noise_fn

    def _rollout_reward(self, x, sample, g_z):
        """``CEM.f`` (cem.py:43-48): sequential rollout, summed reward.
        Quirk kept: the reference passes the whole (T, Z) g_z as the goal of
        every predict, so each stage cost is evaluated against g_z[0]."""
        state, reward = x, 0.0
        g0 = g_z[0]
        for u_t in sample:
            c, state = self.model.predict(state, u_t, g0)
            reward += -c
        return reward

    def _calc_action(self, x, g_z):
        m = self.model
        std = self.std0.copy()
        for i in range(self.max_iter):
            noise = self.noise_fn(i)  # (K, T, A)
            samples = np.clip(
                self.planned_us[None] + std[None] * noise, m.bounds_low, m.bounds_high
            )
            rewards = np.array([self._rollout_reward(x, s, g_z) for s in samples])
            elites = samples[np.argsort(-rewards)][: self.n_elite]
            self.planned_us = self.alpha * self.planned_us + (1 - self.alpha) * elites.mean(0)
            std = self.alpha * std + (1 - self.alpha) * elites.std(0)
            if (std < self.epsilon).all():
                break
        return self.planned_us[0]


# ---------------------------------------------------------------------------
# MPPI (agents/mppi.py:36-75)
# ---------------------------------------------------------------------------


class ReplicaMPPI(ReplicaAgent):
    def __init__(self, model, T, K, std, lam, delta_u):
        """``delta_u`` (K, T, A): the perturbations sampled once at agent
        construction (mppi.py:20-21) — injected to match the framework's
        ``resample=False`` state."""
        super().__init__(model, T)
        self.K, self.std, self.lam = K, std, lam
        self.delta_u = np.asarray(delta_u, np.float64)

    def _sample_cost(self, x, delta, g_z):
        """``MPPI.f`` (mppi.py:36-48); same whole-g_z-as-goal quirk as CEM,
        and NO action clipping (clip is commented out at mppi.py:42)."""
        state, total = x, 0.0
        g0 = g_z[0]
        sample = self.planned_us + delta
        inv_var = 1.0 / self.std**2  # pinv(std^2) for the scalar std
        for t in range(self.T):
            c, state = self.model.predict(state, sample[t], g0)
            total += c + self.lam * float(sample[t] @ (inv_var * delta[t]))
        return total

    def _calc_action(self, x, g_z):
        costs = np.array([self._sample_cost(x, self.delta_u[k], g_z)
                          for k in range(self.K)])
        beta = costs.min()
        w = np.exp(-(costs - beta) / self.lam)
        w = w / w.sum()
        # mppi.py:64-69: erg[t] = sum over ALL axes of w * delta.T[:, t]
        # (scalar; correct only for action_size == 1, like the reference)
        erg = np.array([[np.sum(w * self.delta_u.T[:, t])] for t in range(self.T)])
        self.planned_us = self.planned_us + erg
        return self.planned_us[0]


# ---------------------------------------------------------------------------
# iLQR (agents/ilqr.py:119-350) with central-FD derivatives
# ---------------------------------------------------------------------------


# Richardson-extrapolated central differences. numdifftools (the reference's
# derivative engine) is an adaptive Richardson method with ~1e-9 accuracy;
# plain fixed-step central differences (~1e-5 Hessian error) are NOT an
# adequate stand-in — near small Q_uu the elementwise-gain backward pass
# amplifies that into O(1e-3) gain error, which this gate would misreport
# as a parity failure.


def _fd_grad(f, v, h=1e-4):
    def central(hh):
        g = np.zeros_like(v)
        for i in range(v.size):
            e = np.zeros_like(v)
            e[i] = hh
            g[i] = (f(v + e) - f(v - e)) / (2 * hh)
        return g

    return (4.0 * central(h / 2) - central(h)) / 3.0  # O(h^4)


def _fd_hess(f, v, h=1e-4):
    """Central difference of Richardson gradients (error ~1e-7), symmetrized
    like numdifftools' Hessian."""
    n = v.size
    cols = []
    for j in range(n):
        e = np.zeros(n)
        e[j] = h
        cols.append((_fd_grad(f, v + e) - _fd_grad(f, v - e)) / (2 * h))
    H = np.stack(cols, axis=1)
    return 0.5 * (H + H.T)


def _fd_jac(f, v, h=1e-4):
    def central(hh):
        cols = []
        for i in range(v.size):
            e = np.zeros_like(v)
            e[i] = hh
            cols.append((f(v + e) - f(v - e)) / (2 * hh))
        return np.stack(cols, axis=1)

    return (4.0 * central(h / 2) - central(h)) / 3.0


class ReplicaILQR(ReplicaAgent):
    def __init__(self, model, T, max_iter, threshold, planned_us_init):
        super().__init__(model, T)
        self.max_iter = max_iter
        self.threshold = threshold
        self.planned_us = np.asarray(planned_us_init, np.float64).copy()
        self.mu_min, self.mu_max, self.delta_zero = 1e-6, 1024.0, 2.0
        self.alphas = 1.1 ** (-np.arange(10, dtype=np.float64) ** 2)
        self.mu = 1.0
        self.delta = self.delta_zero

    # cost/dynamics closures over the concatenated (x, u) vector, as the
    # reference builds them (ilqr.py:57-81)
    def _c(self, xu, gz):
        S = self.model.state_size
        return self.model.state_cost(self.model.transform(xu[:S], xu[S:]), gz)

    def _ct(self, x, gz):
        z = self.model.transform(x, np.zeros(self.model.action_size))
        return self.model.terminal_cost(z, gz)

    def _f(self, xu):
        S = self.model.state_size
        return self.model.dynamics(xu[:S], xu[S:])

    def derivatives(self, xs, us, g_z):
        """Diagonal-Hessian derivative stage (ilqr.py:13-45,225-272): keeps
        only diag(l_xx), diag(l_uu) and the hess[-1, :S] row for l_ux; the
        terminal Hessian is also reduced to its diagonal.

        ``xs`` here is the TRUNCATED (T, S) trajectory, because the caller
        passes ``xs[:-1]`` (ilqr.py:132-133) — so the terminal-cost
        derivatives are evaluated at x_{T-1}, not x_T (ilqr.py:267-271
        indexes ``xs[-1]`` of the truncated array). Reference quirk kept."""
        S, A = self.model.state_size, self.model.action_size
        T = self.T
        l_x = np.zeros((T + 1, S))
        l_u = np.zeros((T, A))
        l_xx = np.zeros((T + 1, S))  # diag rows
        l_uu = np.zeros((T, A))
        l_ux = np.zeros((T, S))
        f_x = np.zeros((T, S, S))
        f_u = np.zeros((T, S, A))
        for t in range(T):
            xu = np.concatenate([xs[t], us[t]])
            gz = g_z[t]
            grad = _fd_grad(lambda v: self._c(v, gz), xu)
            hess = _fd_hess(lambda v: self._c(v, gz), xu)
            jac = _fd_jac(self._f, xu)
            l_x[t] = grad[:S]
            l_u[t] = grad[S:]
            l_xx[t] = np.diag(hess)[:S]
            l_uu[t] = np.diag(hess)[S:]
            l_ux[t] = hess[-1, :S]
            f_x[t] = jac[:, :S]
            f_u[t] = jac[:, S:]
        gz = g_z[-1]
        xt = xs[-1].copy()  # = x_{T-1}: the truncated array's last row
        l_x[T] = _fd_grad(lambda v: self._ct(v, gz), xt)
        l_xx[T] = np.diag(_fd_hess(lambda v: self._ct(v, gz), xt))
        return l_x, l_u, l_xx, l_uu, l_ux, f_x, f_u

    def backward_pass(self, l_x, l_u, l_xx, l_uu, l_ux, f_x, f_u):
        """ilqr.py:280-333 verbatim semantics: V_xx starts as the terminal
        *diagonal vector*, cost-Hessian rows broadcast-add, elementwise
        Q_uu**-1 gains."""
        S, A = self.model.state_size, self.model.action_size
        V_x = l_x[-1]
        V_xx = l_xx[-1]  # (S,) vector on the first step
        ks = np.zeros((self.T, A))
        Ks = np.zeros((self.T, A, S))
        eye = np.eye(S)
        for t in range(self.T - 1, -1, -1):
            try:
                Q_x = l_x[t] + f_x[t].T @ V_x
                Q_u = l_u[t] + f_u[t].T @ V_x
                Q_xx = l_xx[None, t] + f_x[t].T @ V_xx @ f_x[t]
                V_reg = V_xx + self.mu * eye
                Q_uu = l_uu[None, t] + f_u[t].T @ V_reg @ f_u[t]
                Q_ux = l_ux[None, t] + f_u[t].T @ V_reg @ f_x[t]
            except Exception:
                return 0, 0, False
            ks[t] = k = -(Q_uu**-1) @ Q_u
            Ks[t] = K = -(Q_uu**-1) @ Q_ux
            V_x = Q_x + K.T @ Q_uu @ k + K.T @ Q_u + Q_ux.T @ k
            V_xx = Q_xx + K.T @ Q_uu @ K + K.T @ Q_ux + Q_ux.T @ K
            V_xx = 0.5 * (V_xx + V_xx.T)
        return ks, Ks, True

    def forward_pass(self, alpha, ks, Ks, xs, us):
        """ilqr.py:340-350: stage costs against a ZERO goal (predict is
        called without goal), clip inside the loop."""
        m = self.model
        S = m.state_size
        x_hat = np.zeros_like(xs)
        u_hat = np.zeros_like(us)
        x_hat[0] = xs[0]
        g0 = np.zeros(S + m.action_size)
        c_hat = 0.0
        for t in range(self.T):
            u_hat[t] = us[t] + alpha * ks[t] + Ks[t] @ (x_hat[t] - xs[t])
            u_hat = np.clip(u_hat, m.bounds_low, m.bounds_high)
            c, x_hat[t + 1] = m.predict(x_hat[t], u_hat[t], g0)
            c_hat += c
        return x_hat, u_hat, c_hat

    def _calc_action(self, x, g_z):
        m = self.model
        self.mu = 1.0
        self.delta = self.delta_zero
        us = self.planned_us.copy()
        converged = False
        accepted = False
        for _ in range(self.max_iter):
            self.mu = np.clip(self.mu, self.mu_min, self.mu_max)
            xs, cost = self.simulate_trajectory(x, us, g_z)
            derivs = self.derivatives(xs[:-1], us, g_z)
            ks, Ks, ok = self.backward_pass(*derivs)
            if not ok:
                self.delta = max(self.delta_zero, self.delta * self.delta_zero)
                self.mu = max(self.mu_min, self.mu * self.delta)
                continue
            us = np.clip(us, m.bounds_low, m.bounds_high)
            test_us = us.copy()
            test_xs = xs.copy()
            for alpha in self.alphas:
                new_xs, new_us, new_cost = self.forward_pass(alpha, ks, Ks, test_xs, test_us)
                new_us = np.clip(new_us, m.bounds_low, m.bounds_high)
                if new_cost < cost:
                    cost = new_cost
                    xs = new_xs.copy()
                    us = new_us.copy()
                    self.delta = min(1 / self.delta_zero, self.delta / self.delta_zero)
                    self.mu = 0 if self.mu * self.delta < self.mu_min else self.mu * self.delta
                    accepted = True
                if np.abs((cost - new_cost) / cost) < self.threshold:
                    converged = True
                    break
            if not accepted:
                self.delta = max(self.delta_zero, self.delta * self.delta_zero)
                self.mu = max(self.mu_min, self.mu * self.delta)
            if converged:
                break
        self.planned_us = us
        return us[0]
