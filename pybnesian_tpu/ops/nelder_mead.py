"""Jitted Nelder–Mead simplex minimizer.

Device-side replacement for the host scipy loop in UCV bandwidth selection:
the reference minimizes the UCV objective with NLopt Nelder–Mead on host,
launching one OpenCL pair-sum pipeline per evaluation (kde/UCV.cpp:469-505).
Here the WHOLE optimization — simplex updates and every objective
evaluation — runs inside one ``lax.while_loop`` on device, so a bandwidth
fit costs one dispatch instead of hundreds of latency-bound round trips.

Coefficients and the initial simplex follow scipy.optimize's Nelder–Mead
(rho=1, chi=2, psi=0.5, sigma=0.5; x0 perturbed 5% per coordinate,
0.00025 for zeros) so results track the host implementation closely.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

__all__ = ["nelder_mead", "nelder_mead_batch"]


def nelder_mead_batch(objective, x0s, fatol, xatol, max_iter: int = 400):
    """Natively lane-batched Nelder–Mead: ``objective`` maps (B, n) points
    to (B,) values (each lane closing over its own data), and every
    iteration costs exactly TWO batched objective calls. The shrink step
    hides behind a SCALAR ``any(shrink)`` predicate, so its n extra
    evaluations only run on the (rare) iterations where some lane actually
    shrinks — unlike ``vmap(nelder_mead)``, where vmapped lax.cond lowers
    to select and every branch executes for every lane every iteration.
    Per-lane update rules, convergence tests and freezing match the
    vmapped form exactly. Returns (x_best (B, n), f_best (B,), iters (B,)).
    """
    B, n = x0s.shape
    rho, chi, psi, sigma = 1.0, 2.0, 0.5, 0.5

    pert = jnp.where(x0s != 0.0, x0s * 1.05, 0.00025)
    vertices = [x0s] + [
        x0s.at[:, k].set(pert[:, k]) for k in range(n)
    ]
    simplex = jnp.stack(vertices, axis=1)  # (B, n+1, n)
    fvals = jnp.stack(
        [objective(simplex[:, v]) for v in range(n + 1)], axis=1
    )

    def order(sim, fv):
        idx = jnp.argsort(fv, axis=1)
        return (
            jnp.take_along_axis(sim, idx[:, :, None], axis=1),
            jnp.take_along_axis(fv, idx, axis=1),
        )

    simplex, fvals = order(simplex, fvals)

    def converged(sim, fv):
        fspread = jnp.max(jnp.abs(fv[:, 1:] - fv[:, :1]), axis=1)
        xspread = jnp.max(
            jnp.abs(sim[:, 1:] - sim[:, :1]), axis=(1, 2)
        )
        return (fspread <= fatol) & (xspread <= xatol)

    def body(state):
        sim, fv, it, done = state
        xbar = jnp.mean(sim[:, :-1], axis=1)
        xw = sim[:, -1]
        fw = fv[:, -1]
        xr = xbar + rho * (xbar - xw)
        fr = objective(xr)

        best = fr < fv[:, 0]
        mid = (~best) & (fr < fv[:, -2])
        outside = (~best) & (~mid) & (fr < fw)
        x2 = jnp.where(
            best[:, None],
            xbar + rho * chi * (xbar - xw),
            jnp.where(
                outside[:, None],
                xbar + psi * rho * (xbar - xw),
                xbar - psi * (xbar - xw),
            ),
        )
        f2 = objective(x2)

        take2 = jnp.where(
            best, f2 < fr, jnp.where(outside, f2 <= fr, f2 < fw)
        )
        use_r = mid | (~take2 & best)
        new_x = jnp.where(use_r[:, None], xr, x2)
        new_f = jnp.where(use_r, fr, f2)
        shrink = (~best) & (~mid) & (
            jnp.where(outside, f2 > fr, f2 >= fw)
        ) & (~done)

        sim_acc = sim.at[:, -1].set(
            jnp.where(done[:, None], xw, new_x)
        )
        fv_acc = fv.at[:, -1].set(jnp.where(done, fw, new_f))

        def do_shrink(args):
            sim_a, fv_a = args
            shrunk = sim[:, :1] + sigma * (sim - sim[:, :1])
            fs = jnp.stack(
                [fv[:, 0]]
                + [objective(shrunk[:, v]) for v in range(1, n + 1)],
                axis=1,
            )
            shrunk = shrunk.at[:, 0].set(sim[:, 0])
            keep = shrink[:, None]
            return (
                jnp.where(keep[:, :, None], shrunk, sim_a),
                jnp.where(keep, fs, fv_a),
            )

        sim2, fv2 = jax.lax.cond(
            jnp.any(shrink), do_shrink, lambda a: a, (sim_acc, fv_acc)
        )
        # frozen lanes keep their simplex untouched
        sim2 = jnp.where(done[:, None, None], sim, sim2)
        fv2 = jnp.where(done[:, None], fv, fv2)
        sim2, fv2 = order(sim2, fv2)
        it2 = it + jnp.where(done, 0, 1)
        done2 = done | converged(sim2, fv2) | (it2 >= max_iter)
        return sim2, fv2, it2, done2

    def cond(state):
        _, _, _, done = state
        return ~jnp.all(done)

    done0 = converged(simplex, fvals)
    simplex, fvals, iters, _ = jax.lax.while_loop(
        cond, body,
        (simplex, fvals, jnp.zeros(B, jnp.int32), done0),
    )
    return simplex[:, 0], fvals[:, 0], iters


def nelder_mead(objective, x0, fatol, xatol, max_iter: int = 400):
    """Minimize ``objective`` (a jax-traceable scalar function of a 1-D
    vector) starting at ``x0``. Returns (x_best, f_best, n_iter). Call under
    jit for a single-dispatch optimization."""
    n = x0.shape[0]
    rho, chi, psi, sigma = 1.0, 2.0, 0.5, 0.5

    pert = jnp.where(x0 != 0.0, x0 * 1.05, 0.00025)
    # rows 1..n equal x0 with coordinate k replaced by pert[k]
    simplex = jnp.concatenate(
        [
            x0[None, :],
            jnp.tile(x0, (n, 1)).at[jnp.arange(n), jnp.arange(n)].set(pert),
        ],
        axis=0,
    )
    fvals = jax.vmap(objective)(simplex)

    def order(sim, fv):
        idx = jnp.argsort(fv)
        return sim[idx], fv[idx]

    simplex, fvals = order(simplex, fvals)

    def converged(sim, fv):
        fspread = jnp.max(jnp.abs(fv[1:] - fv[0]))
        xspread = jnp.max(jnp.abs(sim[1:] - sim[0]))
        return (fspread <= fatol) & (xspread <= xatol)

    def body(state):
        # Two objective evaluations per iteration, by construction: the
        # reflection, then ONE second point selected among expansion /
        # outside contraction / inside contraction. Under vmap a lax.cond
        # lowers to select (BOTH branches execute for every lane every
        # iteration), so the branchy textbook form costs 4 + (n+1) evals
        # per iteration; this form costs 2 + (n+1), with identical accept
        # semantics (scipy's rules). The shrink evaluation is irreducible
        # under batching but rarely changes anything — non-shrinking lanes
        # select their untouched simplex.
        sim, fv, it = state
        xbar = jnp.mean(sim[:-1], axis=0)
        xw = sim[-1]
        fw = fv[-1]
        xr = xbar + rho * (xbar - xw)
        fr = objective(xr)

        best = fr < fv[0]
        mid = (~best) & (fr < fv[-2])
        outside = (~best) & (~mid) & (fr < fw)
        x2 = jnp.where(
            best,
            xbar + rho * chi * (xbar - xw),          # expansion
            jnp.where(
                outside,
                xbar + psi * rho * (xbar - xw),      # outside contraction
                xbar - psi * (xbar - xw),            # inside contraction
            ),
        )
        f2 = objective(x2)

        # accept rules (scipy): expand takes the better of xe/xr; reflect
        # takes xr; contractions accept only when they improve, else shrink
        take2 = jnp.where(
            best, f2 < fr, jnp.where(outside, f2 <= fr, f2 < fw)
        )
        new_x = jnp.where(mid | (~take2 & best), xr, x2)
        new_f = jnp.where(mid | (~take2 & best), fr, f2)
        shrink = (~best) & (~mid) & (
            jnp.where(outside, f2 > fr, f2 >= fw)
        )

        def do_shrink(args):
            s, f = args
            shrunk = s[0][None, :] + sigma * (s - s[0][None, :])
            fs = jax.vmap(objective)(shrunk)
            # keep the best vertex exact
            shrunk = shrunk.at[0].set(s[0])
            fs = fs.at[0].set(f[0])
            return shrunk, fs

        def accept(args):
            s, f = args
            return s.at[-1].set(new_x), f.at[-1].set(new_f)

        sim2, fv2 = jax.lax.cond(shrink, do_shrink, accept, (sim, fv))
        sim2, fv2 = order(sim2, fv2)
        return sim2, fv2, it + 1

    def cond(state):
        sim, fv, it = state
        return (it < max_iter) & (~converged(sim, fv))

    simplex, fvals, iters = jax.lax.while_loop(
        cond, body, (simplex, fvals, jnp.asarray(0))
    )
    return simplex[0], fvals[0], iters
