"""Probe: compile each fused decoder level standalone on the real chip
(round-3 debug; see probe_enc_levels.py)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np
import jax.numpy as jnp

B, T = 32, 401
KERNELS = [1, 8, 16, 32, 64, 128, 128]


def main(which):
    from se_tpu.ops.pallas_decoder import (_VMEM_BUDGET, _vmem_estimate,
                                           decoder_level,
                                           split_phase_weights)
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.05

    f = 4
    cur = 128
    for i in range(5):  # level 5 keeps the XLA path in production
        skip = KERNELS[6 - i]  # skips_c[-1-i] = encoder level (5-i) output
        c_comp = skip + cur
        cout = KERNELS[5 - i]
        if not which or i in which:
            xc = mk(B, T, f, 2 * c_comp)
            xm = mk(B, T, f, c_comp)
            wc = mk(2, 5, 2 * c_comp, 2 * cout)
            wce, wco = split_phase_weights(wc)
            wm = mk(2, 5, c_comp, cout)
            wme, wmo = split_phase_weights(wm)
            pc = (wce, wco, mk(1, 2 * cout), mk(1, 2 * cout),
                  mk(1, 2 * cout), mk(1, 1))
            pm = (wme, wmo, mk(1, cout), mk(1, cout), mk(1, cout),
                  mk(1, 1))
            # report the VMEM-gate decision so "ok" is unambiguous about
            # which path (pallas vs gated XLA reference) actually compiled
            est = _vmem_estimate(T, f, 2 * c_comp, c_comp, cout)
            path = ("PALLAS" if est <= _VMEM_BUDGET
                    else "XLA-reference (gated)")
            print(f"level {i}: F={f} c_comp={c_comp} cout={cout} "
                  f"est={est / 2**20:.0f}MB path={path} ...", flush=True)
            yc, ym = decoder_level(xc, xm, pc + pm, has_bn=True,
                                   interpret=False)
            yc.block_until_ready()
            print(f"  ok: {yc.shape} {ym.shape}", flush=True)
        f *= 2
        cur = cout


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]])
