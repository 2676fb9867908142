import time, sys
t0 = time.time()
try:
    import jax
    d = jax.devices()
    print("OK", d, "%.1fs" % (time.time()-t0))
except Exception as e:
    print("DOWN", repr(e), "%.1fs" % (time.time()-t0))
    sys.exit(1)
