"""A/B probe: why did the fm one-kernel rows measure 0.66/0.74 GS/s in
the r4 suite but 3.42/8.97 GS/s in the r5 roofline run (same code)?

Axes probed, all with `profiling.measure_rate` (median of wide-gap
differences):
  * input data: suite's full-scale unit-circle IQ (cossin of random
    phases, |x| ~ 2^31) vs roofline's +-2^27 uniform noise;
  * stateful chaining (suite) vs stateless repetition (roofline);
  * angle = exact (limb atan2) vs fast (f32).

Run detached on the device; one line per config.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.filters.fm_pallas import fm_disc_bank
    from idsp_tpu.pipelines import fm_disc
    from idsp_tpu.profiling import measure_rate, sync
    from idsp_tpu.ops.trig import cossin

    c, t = 512, 32768
    rng = np.random.default_rng(0)
    ba_fm = np.asarray(fm_disc.deemphasis_coefficients(0.02))

    ph = jnp.asarray(rng.integers(-(2**31), 2**31, size=(t, c),
                                  dtype=np.int64).astype(np.int32))
    re_circ, im_circ = cossin(ph)
    re_circ = jax.block_until_ready(re_circ)

    def ri32(lim=2**27):
        return jnp.asarray(rng.integers(-lim, lim, size=(t, c),
                                        dtype=np.int64).astype(np.int32))

    re_n, im_n = ri32(), ri32()

    for angle in ("exact", "fast"):
        def step(st, re, im, _angle=angle):
            return fm_disc_bank(ba_fm, st, re, im, 12345,
                                time_chunk=1024, angle=_angle)

        jstep = jax.jit(step)
        for data_name, (re, im) in (("circle", (re_circ, im_circ)),
                                    ("noise", (re_n, im_n))):
            st0 = fm_disc.init_state((c,))
            out = jstep(st0, re, im)
            sync(out)
            for stateful in (True, False):
                if stateful:
                    sec, diffs = measure_rate(
                        jstep, st0, re, im, trials=6, stateful=True)
                else:
                    sec, diffs = measure_rate(
                        lambda _s, _re=re, _im=im: jstep(st0, _re, _im),
                        None, trials=6, stateful=False)
                rate = c * t / sec
                lo, hi = min(diffs), max(diffs)
                spread = (hi - lo) / sec * 100
                print(f"fm angle={angle:5s} data={data_name:6s} "
                      f"stateful={int(stateful)} : {rate / 1e9:6.2f} GS/s"
                      f" (spread {spread:.0f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
