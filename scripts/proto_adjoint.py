"""Prototype: de-risk the in-kernel adjoint (reverse-mode) backward.

Checks, in interpret mode and compiled on the real TPU:
  1. jax.vjp of a dense plane function INSIDE a pallas kernel body
     (where/sqrt/sin/normalize chains — the physics op mix).
  2. A two-phase loop: forward fori storing per-step state to VMEM
     scratch with dynamic 8-aligned slices, then a reverse fori reloading
     and applying per-step VJPs, chaining a lambda carry.
  3. One-hot scatter of per-lane cotangents into a (1, 128) accumulator
     row via dot_general (the gradient-table reduction).

Validates against jax.grad of the same chain computed outside pallas.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8
DEPTH = 6


def make_kernel(interpret):
    def kernel(x_ref, g_ref, idx_ref, out_ref, dacc_ref, scratch):
        x = x_ref[:]                       # (R, 128) state
        g = g_ref[:]                       # cotangent plane
        idx = idx_ref[:]                   # per-lane scatter row id (int32)
        zero = x * 0.0

        # per-step "physics": state' = f(theta_lane, state); radiance-like
        # side output r = h(theta_lane, state)
        def phys(th_pl, s):
            y = jnp.where(s > 0.3, jnp.sqrt(jnp.abs(s) + 0.1) * th_pl,
                          jnp.sin(s) + 0.2 * th_pl * s)
            r = jnp.where(y > 0.0, y * th_pl, 0.0)
            return y, r

        th = jnp.where(idx == 0, 1.3, jnp.where(idx == 1, 0.7, 1.05))

        # ---- phase F: forward, storing each step's input state
        def fwd(b, carry):
            s, acc = carry
            scratch[pl.ds(b * R, R), :] = s
            s2, r = phys(th, s)
            return s2, acc + r

        s_fin, acc = jax.lax.fori_loop(0, DEPTH, fwd, (x, zero))
        out_ref[:] = acc

        # ---- phase R: reverse, chaining lambda through state
        def rev(i, carry):
            lam, dth = carry
            b = DEPTH - 1 - i
            s = scratch[pl.ds(b * R, R), :]
            _, vjp = jax.vjp(phys, th, s)
            dth_b, lam_new = vjp((lam, g))
            return lam_new, dth + dth_b

        lam0 = zero
        _, dth = jax.lax.fori_loop(0, DEPTH, rev, (lam0, zero))

        # ---- one-hot scatter: sum dth per idx row into a (1,128) acc row
        iota = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 2)
        oh = (idx[:, :, None] == iota).astype(jnp.float32)
        red = jnp.sum(oh * dth[:, :, None], axis=(0, 1))
        dacc_ref[0] = red.reshape(1, 128)[0]

    return kernel


def run(interpret):
    x = jnp.asarray(
        np.random.RandomState(0).randn(R, 128), jnp.float32)
    g = jnp.ones((R, 128), jnp.float32) * 0.5
    idx = jnp.asarray(
        np.random.RandomState(1).randint(0, 3, (R, 128)), jnp.int32)

    out, dacc = pl.pallas_call(
        make_kernel(interpret),
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((DEPTH * R, 128), jnp.float32)],
        interpret=interpret,
    )(x, g, idx)

    # oracle: plain JAX
    def chain(th_by_row, x):
        th = th_by_row[idx]

        def phys(th_pl, s):
            y = jnp.where(s > 0.3, jnp.sqrt(jnp.abs(s) + 0.1) * th_pl,
                          jnp.sin(s) + 0.2 * th_pl * s)
            r = jnp.where(y > 0.0, y * th_pl, 0.0)
            return y, r

        acc = jnp.zeros_like(x)
        s = x
        for _ in range(DEPTH):
            s, r = phys(th, s)
            acc = acc + r
        return jnp.sum(acc * g)

    th_rows = jnp.asarray([1.3, 0.7, 1.05] + [0.0] * 125, jnp.float32)
    ref_loss, ref_dth = jax.value_and_grad(chain)(th_rows, x)
    got_loss = float(jnp.sum(out * g))
    print("loss:", got_loss, "ref:", float(ref_loss),
          "match:", np.isclose(got_loss, float(ref_loss), rtol=1e-4))
    ok = np.allclose(np.asarray(dacc)[0, :3], np.asarray(ref_dth)[:3],
                     rtol=1e-4, atol=1e-5)
    print("dtheta:", np.asarray(dacc)[0, :3], "ref:",
          np.asarray(ref_dth)[:3], "match:", ok)
    return ok and np.isclose(got_loss, float(ref_loss), rtol=1e-4)


if __name__ == "__main__":
    import sys
    interpret = "--tpu" not in sys.argv
    print("interpret" if interpret else "compiled TPU")
    ok = run(interpret)
    print("OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)
