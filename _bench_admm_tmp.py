import time, jax, jax.numpy as jnp, numpy as np
from jax import lax
from benchmarking_mpc_solvers_tpu.ops.qp import CondensedQP, admm_solve
from benchmarking_mpc_solvers_tpu.ops.qp_pallas import admm_iterate
from benchmarking_mpc_solvers_tpu.utils import slope_timer

n, B, iters, rho = 50, 512, 100, 1.0
key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (B, n, n), jnp.float32)
Hs = jnp.einsum('bij,bkj->bik', A, A) / n + jnp.eye(n)
g = jax.random.normal(jax.random.fold_in(key, 1), (B, n), jnp.float32)
lo, hi = -jnp.ones(n), jnp.ones(n)
Minv = jnp.linalg.inv(Hs + rho * jnp.eye(n))
Minv_shared = Minv[0]

def qp(Hb, gb):
    return CondensedQP(Hb, gb, lo, hi, jnp.zeros((1,1,n)), jnp.zeros((1,1)))

def xla_perb(k):
    gg = g + 1e-6 * jax.random.normal(k, g.shape)
    return jax.vmap(lambda Hb, gb: admm_solve(qp(Hb, gb), rho=rho, iters=iters, eps=0.0).U)(Hs, gg).sum()

def pallas_perb(k):
    gg = g + 1e-6 * jax.random.normal(k, g.shape)
    return admm_iterate(Minv, gg, lo, hi, rho=rho, iters=iters).sum()

def pallas_shared(k):
    gg = g + 1e-6 * jax.random.normal(k, g.shape)
    return admm_iterate(Minv_shared, gg, lo, hi, rho=rho, iters=iters).sum()

# fair XLA baseline with precomputed inverse too (no cho_solve)
def xla_minv(k):
    gg = g + 1e-6 * jax.random.normal(k, g.shape)
    def body(zy, _):
        z, y = zy
        u = jnp.einsum('bij,bj->bi', Minv, rho*(z-y) - gg)
        ur = 1.6*u - 0.6*z
        zn = jnp.clip(ur + y, lo, hi)
        return (zn, y + ur - zn), None
    z0 = jnp.zeros_like(gg)
    (z, _), _ = lax.scan(body, (z0, z0), None, length=iters)
    return z.sum()

for name, f in [("xla cho_solve per-b", xla_perb), ("xla Minv per-b", xla_minv),
                ("pallas per-b", pallas_perb), ("pallas shared-H", pallas_shared)]:
    t = slope_timer(f, inner_reps=21, outer_reps=3)
    print(f"{name:22s}: {t*1e6:9.1f} us/solve-batch  ({B*1e-3/t:.1f}k QPs/s)")
# correctness cross-check on device
z1 = np.asarray(pallas_perb(jax.random.PRNGKey(9)))
z2 = np.asarray(xla_minv(jax.random.PRNGKey(9)))
print("checksum pallas/xla:", z1, z2)
