"""Time the Pallas GL kernel against the XLA f32 GL stage on the real
TPU and verify the integer fields match bit-for-bit (VERDICT r1 item 5).

Run on hardware (no env overrides needed — uses whatever backend JAX
picks): ``python scripts/pallas_vs_jnp.py [n_variants]``.

Measured 2026-08-20, TPU v5e (axon), n=1024 (the engine chunk size):
jnp 0.914 ms/chunk, Pallas 0.598 ms/chunk (1.53x) — see
docs/ARCHITECTURE.md "GL kernel" for the default policy this set.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from svtyper_tpu.ops.gl import genotype_batch, log_choose_table
from svtyper_tpu.ops.pallas_gl import genotype_batch_pallas

INT_KEYS = [
    "null", "gt_idx", "gq", "qr", "qa", "dp", "ro", "ao",
    "rs", "as_", "asc", "rp", "ap",
]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    assert n % 512 == 0, "n must be a multiple of BLOCK_N=512"
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    counts = rng.gamma(2.0, 10.0, size=(n, 5)).astype(np.float32)
    counts[rng.random(n) < 0.1] = 0.0
    is_dup = jnp.asarray(rng.random(n) < 0.3)
    fnull = jnp.asarray(rng.random(n) < 0.05)
    lcf = jnp.asarray(log_choose_table(1 << 17, use_f64=False))

    jb = jax.jit(lambda c, d, f: genotype_batch(c, d, f, lcf))
    jp = jax.jit(genotype_batch_pallas)
    c, ct = jnp.asarray(counts), jnp.asarray(counts.T)

    ref = jax.block_until_ready(jb(c, is_dup, fnull))
    ints, flts = jax.block_until_ready(jp(ct, is_dup, fnull))
    ints = np.asarray(ints)
    bad = [
        k for row, k in enumerate(INT_KEYS)
        if (ints[row] != np.asarray(ref[k]).astype(np.int32)).any()
    ]
    print("int fields:", "ALL EXACT" if not bad else "DIFFER: %s" % bad,
          flush=True)
    sq = np.asarray(flts)[3]
    print("sq max abs diff: %.3g" % np.abs(sq - np.asarray(ref["sq"])).max(),
          flush=True)

    for name, fn, args in [("jnp", jb, (c, is_dup, fnull)),
                           ("pallas", jp, (ct, is_dup, fnull))]:
        jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(100):
            out = fn(*args)
        jax.block_until_ready(out)
        print("%s n=%d: %.3f ms/chunk"
              % (name, n, (time.time() - t0) / 100 * 1e3), flush=True)


if __name__ == "__main__":
    main()
