"""Probe: cossin LUT strategy on the real chip for the DDC mix stage.

select = 128-way compare/select chain (current default, ~VPU bound at
~260 ops/elem); dot = one-hot MXU matmul (rides the MXU instead).
Checks bit-equality on-device, then times the full mix stage.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu import fxp
    from idsp_tpu.ops.trig import cossin

    c = 512
    t = 32768
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}", flush=True)

    x = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64).astype(
            np.int32
        )
    )
    steps = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(c,), dtype=np.int64).astype(
            np.int32
        )
    )

    # on-device bit-equality select vs dot on a 1M random phase sample
    ph = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(1 << 20), dtype=np.int64).astype(
            np.int32
        )
    )

    @jax.jit
    def check(ph):
        cs, ss = cossin(ph, lookup="select")
        cd, sd = cossin(ph, lookup="dot")
        return jnp.all(cs == cd) & jnp.all(ss == sd)

    print(f"select==dot on 1M phases: {bool(check(ph))}", flush=True)

    def diff_time(run, state):
        s = run(state)
        _ = float(jnp.sum(jax.tree.leaves(s)[0].astype(jnp.float32)))

        def timed(iters):
            t0 = time.perf_counter()
            cur = state
            for _ in range(iters):
                cur = run(cur)
            leaf = jax.tree.leaves(cur)[0]
            _ = float(jnp.sum(leaf.astype(jnp.float32)))
            return time.perf_counter() - t0

        n1, n2 = 5, 20
        best = float("inf")
        for _ in range(3):
            d1 = timed(n1)
            d2 = timed(n2)
            best = min(best, max((d2 - d1) / (n2 - n1), 1e-9))
        return best

    def probe(name, run, state):
        try:
            secs = diff_time(run, state)
            print(f"{name:44s} {secs*1e3:8.3f} ms "
                  f"({c*t/secs/1e9:6.2f} GS/s)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{name:44s} FAIL {type(e).__name__}: {msg}", flush=True)

    for lk in ("select", "dot"):
        @jax.jit
        def mix_only(phase0, lk=lk):
            idx = (jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF).astype(
                jnp.int32
            )
            phases = phase0[None, :] + steps[None, :] * idx[:, None]
            lo_re, lo_im = cossin(phases, lookup=lk)
            xi = x[:, None]
            mi = fxp.q_apply(lo_re, xi, 32)
            mq = fxp.q_apply(-lo_im, xi, 32)
            miq = jnp.concatenate([mi, mq], axis=1)
            # barrier forces full materialization (no DCE of the mix)
            miq = jax.lax.optimization_barrier(miq)
            return phase0 + steps + miq[0, :c]

        probe(f"mix ({lk})", mix_only, jnp.zeros((c,), jnp.int32))

        @jax.jit
        def cs_only(phase0, lk=lk):
            idx = (jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF).astype(
                jnp.int32
            )
            phases = phase0[None, :] + steps[None, :] * idx[:, None]
            lo_re, lo_im = cossin(phases, lookup=lk)
            lo_re, lo_im = jax.lax.optimization_barrier((lo_re, lo_im))
            return phase0 + steps + lo_re[0] + lo_im[0]

        probe(f"cossin only ({lk})", cs_only, jnp.zeros((c,), jnp.int32))


if __name__ == "__main__":
    main()
