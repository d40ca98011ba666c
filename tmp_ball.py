import faulthandler, sys
faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)
import bench
bench._setup_jax()
import dedalus_tpu
r = bench.run_ball(64, 32, 32, n_steps=20, matsolver=None)
print("BALL:", r)
