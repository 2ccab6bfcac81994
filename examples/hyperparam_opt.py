"""Gradient-based hyper-parameter tuning through the solver.

A pogs_tpu-only capability (the C++/CUDA reference has no autodiff): the
solve itself is differentiable via implicit differentiation of its
Douglas-Rachford fixed point (pogs_tpu/api/diff.py), so the regularization
weight lambda can be tuned by *gradient descent on the validation loss* —
the classic bilevel program

    min_{lam}  L_val(x*(lam))    s.t.  x*(lam) = argmin_x  0.5||A_tr x - b_tr||^2 + lam||x||_1

solved end-to-end with optax, entirely on device, with jit+grad.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from pogs_tpu import SolverSettings
from pogs_tpu.api.diff import diff_lasso
from common import banner

jax.config.update("jax_enable_x64", True)


def main(m=120, n=40, seed=0, steps=100):
    banner(f"Bilevel lambda tuning (lasso {m}x{n})")
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((2 * m, n))
    x_true = rng.standard_normal(n) * (rng.random(n) < 0.25)
    b = A @ x_true + 0.3 * rng.standard_normal(2 * m)
    A_tr, A_val = jnp.asarray(A[:m]), jnp.asarray(A[m:])
    b_tr, b_val = jnp.asarray(b[:m]), jnp.asarray(b[m:])

    settings = SolverSettings(abs_tol=1e-8, rel_tol=1e-8, max_iter=20000)

    # Optimize log(lam) for positivity.
    def val_loss(log_lam):
        x, _ = diff_lasso(A_tr, b_tr, jnp.exp(log_lam), settings=settings)
        r = A_val @ x - b_val
        return 0.5 * jnp.mean(r ** 2)

    loss_grad = jax.jit(jax.value_and_grad(val_loss))

    lam0 = 0.5 * float(jnp.max(jnp.abs(A_tr.T @ b_tr)))
    log_lam = jnp.asarray(np.log(lam0), jnp.float64)
    opt = optax.adam(0.15)
    state = opt.init(log_lam)

    for it in range(steps):
        loss, g = loss_grad(log_lam)
        upd, state = opt.update(g, state)
        log_lam = optax.apply_updates(log_lam, upd)
        if it % 10 == 0 or it == steps - 1:
            print(f"  step {it:3d}: lam = {float(jnp.exp(log_lam)):9.4f}  "
                  f"val_loss = {float(loss):.6f}  dval/dloglam = {float(g):+.5f}")

    # Compare against a dense grid (the "classic" way).
    lams = np.exp(np.linspace(np.log(lam0) - 4, np.log(lam0) + 1, 25))
    grid = [float(val_loss(jnp.asarray(np.log(l)))) for l in lams]
    best = lams[int(np.argmin(grid))]
    print(f"  gradient-tuned lam = {float(jnp.exp(log_lam)):.4f} "
          f"(val {float(val_loss(log_lam)):.6f})")
    print(f"  25-point grid best = {best:.4f} (val {min(grid):.6f})")


if __name__ == "__main__":
    main()
