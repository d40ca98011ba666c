import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from collections import Counter
import dedalus_tpu
import dedalus_tpu.public as d3
from dedalus_tpu.models.ball import build_ball_problem, set_conductive_ic
import dedalus_tpu.core.timesteppers as T
import time

t0 = time.time()
problem, ctx = build_ball_problem(64, 32, 32, Rayleigh=1e4)
set_conductive_ic(ctx)
solver = problem.build_solver(d3.SBDF2, matsolver=None)
print("build:", round(time.time()-t0,1), "s; matsolver:", solver.matsolver)
ts = solver.timestepper
dt = 1e-4
ts.dt_hist.appendleft(dt)
a, bb, c = ts.compute_coefficients(list(ts.dt_hist), 0)
n = ts.steps + 1
a, bb, c = T._pad(a, n), T._pad(bb, n), T._pad(c, n)
t1 = time.time()
fact = ts._prepare(a[0], bb[0])
print("prepare:", round(time.time()-t1,1), "s; matsolver now:", solver.matsolver)
mats = ts._step_mats(fact)
state_flat = solver.state_flat()
rhs0 = jnp.zeros_like(ts.MX[0])
args = (state_flat, jnp.asarray(0.0), ts.MX, ts.LX, ts.F, rhs0,
        jnp.asarray(a), jnp.asarray(bb), jnp.asarray(c), mats)
step_impl = ts._build_compiled(derive_lx=(solver.matsolver=='poly'))
t2 = time.time()
jaxpr = jax.make_jaxpr(step_impl)(*args)
print("trace:", round(time.time()-t2,1), "s")
def count(jx, ctr):
    for eq in jx.eqns:
        ctr[eq.primitive.name] += 1
        for v in eq.params.values():
            if hasattr(v, 'jaxpr'):
                count(v.jaxpr, ctr)
            elif isinstance(v, (list, tuple)):
                for u in v:
                    if hasattr(u, 'jaxpr'):
                        count(u.jaxpr, ctr)
ctr = Counter()
count(jaxpr.jaxpr, ctr)
print("total eqns:", sum(ctr.values()))
for k, v in ctr.most_common(12):
    print(f"  {k}: {v}")
