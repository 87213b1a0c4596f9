"""Probe: compile each fused encoder/decoder level standalone on the real
chip to find which geometry breaks the remote compiler (round-3 debug)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np
import jax
import jax.numpy as jnp

B, T = 32, 401
KERNELS = [1, 8, 16, 32, 64, 128, 128]


def enc_params(cin, cout, rng):
    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.05

    pc = (mk(2, 5, 2 * cin, 2 * cout), mk(1, 2 * cout), mk(1, 2 * cout),
          mk(1, 2 * cout), mk(1, 1))
    pm = (mk(2, 5, cin, cout), mk(1, cout), mk(1, cout), mk(1, cout),
          mk(1, 1))
    return pc + pm


def main(which):
    from se_tpu.ops.pallas_encoder import (_VMEM_BUDGET, _vmem_estimate,
                                           encoder_level)
    rng = np.random.default_rng(0)
    f = 256
    for i in range(6):
        cin, cout = KERNELS[i], KERNELS[i + 1]
        if which and i not in which:
            f //= 2
            continue
        xc = jnp.asarray(rng.standard_normal((B, T, f, 2 * cin)),
                         jnp.float32)
        xm = jnp.asarray(rng.standard_normal((B, T, f, cin)), jnp.float32)
        params = enc_params(cin, cout, rng)
        # the VMEM gate inside encoder_level routes over-budget levels to
        # the XLA reference even with interpret=False — report which path
        # this geometry actually exercises so "ok" is unambiguous
        est = _vmem_estimate(T, f, cin, cout)
        path = "PALLAS" if est <= _VMEM_BUDGET else "XLA-reference (gated)"
        print(f"level {i}: F={f} cin={cin} cout={cout} "
              f"est={est / 2**20:.0f}MB path={path} ...", flush=True)
        yc, ym = encoder_level(xc, xm, params, interpret=False)
        yc.block_until_ready()
        print(f"  ok: {yc.shape} {ym.shape}", flush=True)
        f //= 2


if __name__ == "__main__":
    which = [int(a) for a in sys.argv[1:]]
    main(which)
