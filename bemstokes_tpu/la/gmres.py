"""Jitted restarted GMRES with Givens rotations and right preconditioning —
the solve layer of the framework (the reference delegates to deal.II
SolverGMRES over Trilinos vectors, `source/bem_stokes.cc:4270-4340`; here the
Arnoldi loop is a lax.while_loop compiled by XLA, so each iteration is one
fused matvec + orthogonalization on device and the loop EXITS at
convergence — a masked fixed-trip scan would execute every one of
restart x max_restarts matvecs even for a 1-iteration solve, which is
exactly the regime the stale-LU preconditioner puts us in).

matvec and precond are arbitrary callables (dense GEMV, implicit monolithic
operator, or sharded shard_map matvec incl. collectives), so the same
routine serves the single-chip and the row-sharded multi-chip paths.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _identity(x):
    return x


def gmres(
    matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    precond=None,
    restart: int = 100,
    tol: float = 1e-10,
    max_restarts: int = 10,
):
    """Solve A x = b. Returns (x, info) with info = dict(residual, iterations).

    Right-preconditioned: solves A M^-1 y = b, x = M^-1 y, so the residual
    is the true residual.  Fixed-shape Arnoldi buffers of size restart+1 per
    cycle; both the inner Arnoldi loop and the outer restart loop are
    lax.while_loops that stop at convergence.
    """
    if precond is None:
        precond = _identity
    n = b.shape[0]
    dt = b.dtype
    if x0 is None:
        x0 = jnp.zeros_like(b)
    m = restart
    b_norm = jnp.linalg.norm(b)
    atol = tol * jnp.where(b_norm == 0, 1.0, b_norm)

    def arnoldi_cycle(x, r):
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dt)
        H = jnp.zeros((m + 1, m), dt)
        # not-yet-defined rotations must act as identity (c=1, s=0)
        cs = jnp.ones((m,), dt)
        sn = jnp.zeros((m,), dt)
        g = jnp.zeros((m + 1,), dt).at[0].set(beta)
        V = V.at[0].set(r / jnp.where(beta == 0, 1.0, beta))

        def cond(state):
            *_, j, done = state
            return jnp.logical_and(j < m, jnp.logical_not(done))

        def body(state):
            V, H, cs, sn, g, j, done = state
            w = matvec(precond(V[j]))
            # modified Gram-Schmidt against all basis vectors (masked; the
            # masked dots are O(m n) vector work, cheap next to the matvec)
            mask = (jnp.arange(m + 1) <= j).astype(dt)

            def mgs(w, i):
                h = jnp.vdot(V[i], w) * mask[i]
                return w - h * V[i], h

            w, hcol = jax.lax.scan(mgs, w, jnp.arange(m + 1))
            hj1 = jnp.linalg.norm(w)
            hcol = hcol.at[j + 1].set(hj1)
            v_next = w / jnp.where(hj1 == 0, 1.0, hj1)
            V = V.at[j + 1].set(v_next)

            # apply accumulated Givens rotations to the new column
            # (rotations with index > j are identity by construction)
            def rot(hc, i):
                hi = hc[i] * cs[i] + hc[i + 1] * sn[i]
                hi1 = -hc[i] * sn[i] + hc[i + 1] * cs[i]
                hc = hc.at[i].set(hi).at[i + 1].set(hi1)
                return hc, None

            hcol, _ = jax.lax.scan(rot, hcol, jnp.arange(m), unroll=False)
            # new rotation to zero hcol[j+1]
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            denom_s = jnp.where(denom == 0, 1.0, denom)
            c_new = jnp.where(denom == 0, 1.0, hcol[j] / denom_s)
            s_new = jnp.where(denom == 0, 0.0, hcol[j + 1] / denom_s)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            g = g.at[j + 1].set(-s_new * g[j]).at[j].set(c_new * g[j])
            H = H.at[:, j].set(hcol)

            done = jnp.abs(g[j + 1]) < atol
            return V, H, cs, sn, g, j + 1, done

        V, H, cs, sn, g, k, _ = jax.lax.while_loop(
            cond, body, (V, H, cs, sn, g, jnp.int32(0), beta < atol)
        )

        # back-substitution on the k x k system (masked full triangular solve)
        mask = (jnp.arange(m) < k).astype(dt)
        Hm = H[:m, :] * mask[None, :] * mask[:, None] + jnp.diag(1.0 - mask)
        y = jax.scipy.linalg.solve_triangular(Hm, g[:m] * mask, lower=False)
        dx = precond((y * mask) @ V[:m])
        return x + dx, jnp.abs(g[k]), k

    def cond(carry):
        _, _, _, res, c = carry
        return jnp.logical_and(c < max_restarts, res > atol)

    def body(carry):
        x, r, total_it, _, c = carry
        x, _, k = arnoldi_cycle(x, r)
        # restart on the TRUE residual: the in-cycle Givens estimate drifts
        # from it under finite precision (especially with the f32-LU
        # preconditioner under f64 iteration), and the estimate deciding the
        # outer exit would stop at a less-converged solution.  The residual
        # VECTOR is carried into the next cycle so the check costs no extra
        # matvec beyond the one each cycle needs anyway.
        r = b - matvec(x)
        res = jnp.linalg.norm(r)
        return x, r, (total_it + k).astype(jnp.int32), res, c + 1

    r0 = b - matvec(x0)
    x, _, iters, res, _ = jax.lax.while_loop(
        cond,
        body,
        (x0, r0, jnp.int32(0), jnp.linalg.norm(r0), jnp.int32(0)),
    )
    return x, {"residual": res, "iterations": iters}
