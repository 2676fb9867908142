"""mxu_inverse recursion-base scan at elast's n=10.5k (round-5).

After the f32-apply fix elast's 0.468 s warm wall is fact-dominated
(mxu_inverse 0.35 s; FLOP model ~2.3 n^3 f32-HIGHEST = ~80 ms at v5e peak,
so the factor runs at ~23% MXU efficiency). The recursion base trades MXU
tile size against the serial VPU leaf scans (base-length lax.scan of
rank-1/substitution steps): scan base in {128, 256, 512, 1024} and check
application quality stays eps*cond-class on the elast-like test matrix.

Usage: python tools/probes/mxu_base_probe.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64

setup_compile_cache()
enable_x64()
import jax
import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.solve.mxu_inverse import mxu_inverse

n = 10522
rng = np.random.default_rng(0)
# elast-like: SPD stiffness core + row equilibration, cond ~1e6
# (tests/test_mxu_inverse.py's construction, scaled up)
Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
d = np.logspace(0, -6, n)
A = (Q * d) @ Q.T
A = A / np.abs(A).max(axis=1, keepdims=True)
A32 = jnp.asarray(A, jnp.float32)
r = jnp.asarray(rng.standard_normal(n), jnp.float32)

for base in (128, 256, 512, 1024):
    f = jax.jit(lambda M, b=base: mxu_inverse(M, base=b))
    X = jax.block_until_ready(f(A32))
    ts = []
    for _ in range(3):
        t0 = time.time()
        X = jax.block_until_ready(f(A32))
        ts.append(time.time() - t0)
    err = jnp.linalg.norm(A32 @ (X @ r) - r) / jnp.linalg.norm(r)
    print(f"base={base:5d}: {min(ts)*1e3:7.1f} ms  quality={float(err):.3e}",
          flush=True)
    X.delete()
