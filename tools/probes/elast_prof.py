"""Time elast (dense-precond Richardson design) on the TPU: compile vs run."""
import sys, time
sys.path.insert(0, "/root/repo")
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64
setup_compile_cache(); enable_x64()
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.elast import make

pb = make()
r = timeloop.Runner(pb)
t0 = time.time(); res = r.run(verbose=False); c = time.time() - t0
t0 = time.time(); res = timeloop.run(pb, verbose=False); w = time.time() - t0
print(f"elast: first(incl compile)={c:.2f}s warm={w:.2f}s "
      f"tip={res.rows[-1,2]:.6g} E={res.rows[-1,1]:.6g}")
