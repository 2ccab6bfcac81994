"""OptNet-style learning through a QP layer (`diff_qp`).

A differentiable QP as the output layer of a model: the linear cost of a
box-constrained QP is predicted from a context vector by a learned map,
and the map is trained end-to-end by gradient descent THROUGH the
optimizer — implicit differentiation of the Douglas–Rachford fixed
point, so the backward cost is one small linear solve regardless of how
many ADMM iterations the forward solve took.  The C++/CUDA reference has
no autodiff capability at all.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pogs_tpu import SolverSettings
from pogs_tpu.api.diff import diff_qp

from common import banner


def main(n=4, ctx=3, batch=16, steps=90, seed=0):
    banner(f"OptNet-style QP layer: n={n} vars, {ctx}-dim context")
    rng = np.random.default_rng(seed)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    P = jnp.asarray(Q @ np.diag(np.geomspace(1.0, 10.0, n)) @ Q.T)
    G = jnp.asarray(np.vstack([np.eye(n), -np.eye(n)]))
    h = jnp.ones(2 * n)  # box |x| <= 1

    st = SolverSettings(abs_tol=1e-7, rel_tol=1e-7, max_iter=10000)

    def layer(W, z):
        """QP layer: x*(z) = argmin 1/2 x'Px + (Wz)'x  s.t. |x| <= 1."""
        x, _ = diff_qp(P, W @ z, G=G, h=h, settings=st)
        return x

    W_true = jnp.asarray(rng.standard_normal((n, ctx)))
    Z = jnp.asarray(rng.standard_normal((batch, ctx)))
    X_target = jax.vmap(lambda z: layer(W_true, z))(Z)
    frac_act = float(jnp.mean(jnp.abs(jnp.abs(X_target) - 1.0) < 1e-6))
    print(f"  targets generated; {100*frac_act:.0f}% of coordinates sit ON "
          "the box boundary (active constraints)")

    @jax.jit
    def loss_and_grad(W):
        def loss(W_):
            X = jax.vmap(lambda z: layer(W_, z))(Z)
            return 0.5 * jnp.mean((X - X_target) ** 2)
        return jax.value_and_grad(loss)(W)

    import optax

    W = jnp.asarray(0.1 * rng.standard_normal((n, ctx)))
    opt = optax.adam(0.1)
    opt_state = opt.init(W)
    for it in range(steps):
        val, g = loss_and_grad(W)
        updates, opt_state = opt.update(g, opt_state)
        W = optax.apply_updates(W, updates)
        if it % 10 == 0 or it == steps - 1:
            print(f"  step {it:3d}  loss {float(val):.3e}")
    assert float(val) < 1e-4, "training through the QP layer failed"
    print("  learned QP layer reproduces targets through active constraints")


if __name__ == "__main__":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    main()
