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

bases = ([int(b) for b in sys.argv[1:]] or [128, 256, 512, 1024])
for base in bases:
    # perturb the operand per rep (cheap rank-0 shift) so no layer — jit
    # cache, runtime, or the tunneled worker — can alias a previous
    # result; chain_r42's first scan printed 0.1 ms for base=128, far
    # under the ~80 ms pure-matmul floor, so every rep is printed and the
    # result feeds the quality check AFTER timing.
    f = jax.jit(lambda M, s, b=base: mxu_inverse(M + s, base=b))
    X = jax.block_until_ready(f(A32, jnp.float32(0.0)))
    ts = []
    for k in range(4):
        s = jnp.float32(1e-7 * k)
        jax.block_until_ready(s)
        t0 = time.time()
        X = jax.block_until_ready(f(A32, s))
        ts.append(time.time() - t0)
    err = jnp.linalg.norm(A32 @ (X @ r) - r) / jnp.linalg.norm(r)
    print(f"base={base:5d}: reps={[round(t*1e3,1) for t in ts]} ms "
          f"quality={float(err):.3e}", flush=True)
    X.delete()
