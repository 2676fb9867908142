"""Lane-fill hypothesis probe for the 3D kernels (round-5).

The pallas3d volumes carry [nz, ny, nx] with x lane-padded 50->128 and
y sublane-padded 50->56 (real/padded = 35% at 50³, 15% at 25³,
ops/pallas3d._tiled_vol_bytes). If the kernels' deep FMA ladders are
VPU-THROUGHPUT-bound, a flat [nz, ny*nx] packing (97% fill, seam-masked
scatter) would cut the per-op cost ~2.8x at L0 / ~5.3x at L1; if they
are op-LATENCY-bound (fixed per-op cost), packing buys nothing.

Times one pallas kernel per shape: an unrolled DEPTH-deep FMA chain over
the whole ref (the kernels' dominant op mix), same chain, three shapes:
  padded-L0   [50*56, 128]  (= today's 50³ layout, 2800 sublane rows)
  flat-L0     [50*20, 128]  (= [50, 2560] packed, 1000 rows)
  padded-L1   [25*32, 128]  (today's 25³), flat-L1 [25*6, 128] ([25,768])

Usage: python tools/probes/lanefill_probe.py [depth] [reps]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
from pfhubbenchmarks_tpu.config import setup_compile_cache

setup_compile_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 200
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

cases = [
    ("padded-L0 [2800,128]", (2800, 128)),
    ("flat-L0   [1000,128]", (1000, 128)),
    ("padded-L1 [800,128]", (800, 128)),
    ("flat-L1   [150,128]", (150, 128)),
]


def kernel(x_ref, y_ref, o_ref):
    a = x_ref[:]
    b = y_ref[:]
    for i in range(depth):
        # QUADRATIC recurrence: an affine chain (a*c1 + b*d1)*c2 + ... is
        # algebraically collapsible to ONE fma (first probe version measured
        # 0.6 us for 287M "FMAs" — folded); a*a cannot fold
        a = a * (1.0 + a * 1e-12) + b * (1e-8 * (i % 5 + 1))
    o_ref[:] = a


for name, shape in cases:
    x = jnp.ones(shape, jnp.float32)
    y = jnp.full(shape, 0.5, jnp.float32)
    call = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))

    # in-device chain + HOST FETCH of a scalar: block_until_ready on this
    # tunneled runtime returns early for small programs (probe v2 measured
    # 0.5 us for 287M unfoldable flops); float() round-trips for real.
    # Two chain lengths, report the slope (cancels the round-trip constant).
    def make(n):
        @jax.jit
        def chain(x, y):
            def body(c, _):
                return call(c, y), None

            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(out)

        return chain

    c1, c4 = make(reps), make(4 * reps)
    s1 = float(c1(x, y)); s4 = float(c4(x, y))          # compile both
    t0 = time.time(); s1 = float(c1(x, y)); t1 = time.time() - t0
    t0 = time.time(); s4 = float(c4(x, y)); t4 = time.time() - t0
    us = (t4 - t1) / (3 * reps) * 1e6
    print(f"{name}: {us:8.1f} us/launch (depth={depth}, "
          f"t1={t1*1e3:.1f}ms t4={t4*1e3:.1f}ms sum={s1:.3e})", flush=True)
