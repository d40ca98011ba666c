import time
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import dedalus_tpu
import dedalus_tpu.public as d3
from dedalus_tpu.models.ball import build_ball_problem, set_conductive_ic

problem, ctx = build_ball_problem(64, 32, 32, Rayleigh=1e4)
set_conductive_ic(ctx)
solver = problem.build_solver(d3.SBDF2)
t0 = time.time()
solver.run_steps(1e-4, 5)
jax.block_until_ready(solver.timestepper.F)
print("5 steps:", round(time.time()-t0, 1), "s; state finite:",
      bool(np.isfinite(np.asarray(solver.state_flat())).all()))
