"""
Distributed Rayleigh-Benard step: the flagship multi-chip training step.

This is the reference's MPI pencil decomposition (SURVEY.md §2.5; dedalus/core/
transposes.pyx) mapped to a JAX device mesh:

  * coefficient pencils (kx mode groups) are sharded over the mesh axis,
  * the batched (G, P, P) implicit solve is embarrassingly parallel over
    groups and stays local to each device,
  * spectral transforms along x require x to be local, achieved with ONE
    `all_to_all` over the ICI each way (z-scatter / kx-gather), exactly the
    Alltoallv transpose of the reference,
  * all transforms are MMT matmuls on the MXU; nonlinear terms are evaluated
    pointwise on the dealiased grid.

The matrices, pencil layout, and static RHS rows are built by the ordinary
serial problem machinery; only the per-step compute is re-expressed as an
SPMD program.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

import dedalus_tpu.public as d3
from ..ops import solve as ops_solve


from ..models.rbc import build_rbc_problem


class DistributedRBC:
    """
    SPMD SBDF2 Rayleigh-Benard stepper over a 1D device mesh: pencils sharded
    over kx groups, ICI all_to_all transposes for the x transforms.
    """

    def __init__(self, Nx, Nz, mesh, Rayleigh=1e6, Prandtl=1.0, dt=1e-3, **kw):
        assert isinstance(mesh, Mesh) and len(mesh.axis_names) == 1
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        nproc = mesh.devices.size
        self.problem, ctx = build_rbc_problem(Nx, Nz, Rayleigh, Prandtl, **kw)
        self.ctx = ctx
        solver = self.problem.build_solver(d3.SBDF2)
        self.solver = solver
        pencil = solver.pencil
        self.pencil = pencil
        G, R, C = pencil.G, pencil.R, pencil.C
        assert G % nproc == 0, f"kx groups ({G}) must divide the mesh ({nproc})"
        dealias = ctx['dealias']
        Nxg, Nzg = int(Nx * dealias), int(Nz * dealias)
        assert Nxg % nproc == 0 and Nzg % nproc == 0, "dealias grid must divide the mesh"
        xb, zb = ctx['xbasis'], ctx['zbasis']
        self.dt = dt
        # --- variable/equation pencil slices (order fixed by the problem) ---
        off = pencil.var_offsets
        names = ['p', 'b', 'u', 'tau_p', 'tau_b1', 'tau_b2', 'tau_u1', 'tau_u2']
        self.var_slices = {n: slice(int(off[i]), int(off[i + 1])) for i, n in enumerate(names)}
        eoff = pencil.eq_offsets
        self.eq_slices = [slice(int(eoff[i]), int(eoff[i + 1])) for i in range(len(pencil.equations))]
        # --- matrices, factorization (SBDF2 startup + steady coefficients) ---
        # Startup step uses SBDF1 coefficients; steady state SBDF2.
        from ..core.timesteppers import SBDF1, SBDF2
        self.coeffs1 = SBDF1.compute_coefficients([dt], 0)
        a2, b2, c2 = SBDF2.compute_coefficients([dt, dt], 1)
        self.coeffs2 = (a2, b2, c2)
        self.M = pencil.matrices['M']
        self.L = pencil.matrices['L']
        A1 = pencil.combined_with_pivots({'M': self.coeffs1[0][0], 'L': self.coeffs1[1][0]})
        A2 = pencil.combined_with_pivots({'M': a2[0], 'L': b2[0]})
        self.lu1, self.perm1 = ops_solve.host_lu_factor_stack(A1)
        self.lu2, self.perm2 = ops_solve.host_lu_factor_stack(A2)
        self.row_valid = pencil.row_valid_dev.astype(np.float64)
        # --- static RHS rows (boundary conditions) ---
        F_static = np.zeros((G, R))
        for e_i, eq in enumerate(self.problem.equations):
            if e_i in (1, 2):
                continue  # nonlinear interior equations: computed per step
            Ff = eq['F'].evaluate()
            Ff.require_coeff_space()
            Ff.change_scales(1)
            flat = np.asarray(Ff.data).ravel()
            F_static[:, self.eq_slices[e_i]] = flat[pencil.eq_index_maps[e_i]]
        self.F_static = jnp.asarray(F_static * np.asarray(pencil.row_valid))
        # --- transform matrices (device constants) ---
        Ub = zb.derivative_basis(1)   # (0.5, 0.5)
        Vb = zb.derivative_basis(2)   # (1.5, 1.5)
        self.Bz_T = jnp.asarray(zb.backward_matrix(dealias, np.float64))    # (Nzg, Nz) from T
        self.Bz_U = jnp.asarray(Ub.backward_matrix(dealias, np.float64))    # (Nzg, Nz) from U
        self.Bx = jnp.asarray(xb.backward_matrix(dealias, np.float64))      # (Nxg, Mx)
        self.Fx = jnp.asarray(xb.forward_matrix(dealias, np.float64))       # (Mx, Nxg)
        self.Fz_V = jnp.asarray(Vb.forward_matrix(dealias, np.float64))     # (Nz, Nzg) to V
        # --- derivative operators ---
        self.Dz = jnp.asarray(zb.differentiation_matrix().toarray())        # T -> U
        k = np.asarray(xb.wavenumbers[0::2])                                 # per group
        Dx_blocks = np.zeros((G, 2, 2))
        Dx_blocks[:, 0, 1] = -k
        Dx_blocks[:, 1, 0] = k
        self.Dx = jnp.asarray(Dx_blocks)                                     # per-group pair rotation
        self.G, self.R, self.C = G, R, C
        self.Nx, self.Nz, self.Nxg, self.Nzg = Nx, Nz, Nxg, Nzg
        self.nproc = nproc
        self._build_step()

    # --- helpers operating on LOCAL blocks inside shard_map ---

    def _var_coeffs(self, X, name, ncomp, zwidth):
        """Local pencils (Gl, C) -> (ncomp, Gl, 2, zwidth) coefficient blocks."""
        Gl = X.shape[0]
        blk = X[:, self.var_slices[name]].reshape(Gl, ncomp, 2, zwidth)
        return jnp.moveaxis(blk, 1, 0)

    def _build_step(self):
        axis = self.axis
        nproc = self.nproc
        Nz, Nzg, Nxg, Mx = self.Nz, self.Nzg, self.Nxg, self.Nx
        Bz_T, Bz_U, Bx, Fx, Fz_V, Dz, Dx = (self.Bz_T, self.Bz_U, self.Bx,
                                            self.Fx, self.Fz_V, self.Dz, self.Dx)
        var_slices = self.var_slices
        eq_slices = self.eq_slices
        kappa, nu = self.ctx['kappa'], self.ctx['nu']
        R, C = self.R, self.C

        def to_grid(cblk, Bz):
            # cblk: (n, Gl, 2, Nz) -> grid (n, Nxg, Nzg/P)
            n, Gl = cblk.shape[0], cblk.shape[1]
            c = cblk.reshape(n, Gl * 2, Nz)
            zg = jnp.einsum('qz,ngz->ngq', Bz, c)          # (n, Mx_loc, Nzg)
            # transpose: gather kx (axis 1), scatter z (axis 2)
            zg = jax.lax.all_to_all(zg, axis, split_axis=2, concat_axis=1, tiled=True)
            # x backward: (Nxg, Mx) @ (n, Mx, Nzg/P)
            return jnp.einsum('xm,nmq->nxq', Bx, zg)

        def to_coeff_V(g):
            # grid (n, Nxg, Nzg/P) -> V-basis coeffs (n, Gl, 2, Nz)
            n = g.shape[0]
            c = jnp.einsum('mx,nxq->nmq', Fx, g)           # (n, Mx, Nzg/P)
            c = jax.lax.all_to_all(c, axis, split_axis=1, concat_axis=2, tiled=True)
            # now (n, Mx/P, Nzg)
            c = jnp.einsum('zq,nmq->nmz', Fz_V, c)         # (n, Mx_loc, Nz)
            Gl = c.shape[1] // 2
            return c.reshape(n, Gl, 2, Nz)

        def rhs_nonlinear(X):
            """Local pencils (Gl, C) -> nonlinear F pencils (Gl, R)."""
            Gl = X.shape[0]
            b_c = self._var_coeffs(X, 'b', 1, Nz)          # (1, Gl, 2, Nz)
            u_c = self._var_coeffs(X, 'u', 2, Nz)          # (2, Gl, 2, Nz)
            # Derivatives in coeff space (local: block-diagonal in kx)
            Dx_l = jax.lax.dynamic_slice_in_dim(
                Dx, jax.lax.axis_index(axis) * Gl, Gl, axis=0)
            dxb_c = jnp.einsum('gij,ngjz->ngiz', Dx_l, b_c)
            dxu_c = jnp.einsum('gij,ngjz->ngiz', Dx_l, u_c)
            dzb_c = jnp.einsum('wz,ngjz->ngjw', Dz, b_c)
            dzu_c = jnp.einsum('wz,ngjz->ngjw', Dz, u_c)
            # To grid (T-basis for fields and x-derivs; U-basis for z-derivs)
            bT = to_grid(jnp.concatenate([b_c, dxb_c, u_c, dxu_c]), Bz_T)
            bU = to_grid(jnp.concatenate([dzb_c, dzu_c]), Bz_U)
            b_g, dxb_g = bT[0], bT[1]
            u_g, w_g = bT[2], bT[3]
            dxu_g, dxw_g = bT[4], bT[5]
            dzb_g = bU[0]
            dzu_g, dzw_g = bU[1], bU[2]
            # Nonlinear terms
            adv_b = -(u_g * dxb_g + w_g * dzb_g)
            adv_u = -(u_g * dxu_g + w_g * dzu_g)
            adv_w = -(u_g * dxw_g + w_g * dzw_g)
            Fc = to_coeff_V(jnp.stack([adv_b, adv_u, adv_w]))  # (3, Gl, 2, Nz)
            F = jnp.zeros((Gl, R))
            F = F.at[:, eq_slices[1]].set(Fc[0].reshape(Gl, 2 * Nz))
            F = F.at[:, eq_slices[2]].set(
                jnp.concatenate([Fc[1].reshape(Gl, 2 * Nz), Fc[2].reshape(Gl, 2 * Nz)], axis=1))
            return F

        def spmd_step(X, MX1, LX1, F1, abc, lu, perm, Fs, Mm, Lm, rvm):
            """One multistep IMEX step on local shards (coefficients abc: (3,3))."""
            a, b, c = abc[0], abc[1], abc[2]
            MX0 = ops_solve.batched_matvec(Mm, X)
            LX0 = ops_solve.batched_matvec(Lm, X)
            F0 = rhs_nonlinear(X) + Fs
            RHS = (c[1] * F0 + c[2] * F1
                   - a[1] * MX0 - a[2] * MX1
                   - b[1] * LX0 - b[2] * LX1) * rvm
            Xn = ops_solve.batched_lu_solve(lu, perm, RHS)
            return Xn, MX0, LX0, F0

        spec_GX = P(self.axis, None)
        spec_G3 = P(self.axis, None, None)
        self.spmd_step = shard_map(
            spmd_step, mesh=self.mesh,
            in_specs=(spec_GX, spec_GX, spec_GX, spec_GX, P(), spec_G3, spec_GX,
                      spec_GX, spec_G3, spec_G3, spec_GX),
            out_specs=(spec_GX, spec_GX, spec_GX, spec_GX))
        self._jit_step = jax.jit(self.spmd_step)

    def initial_state(self, seed=42):
        """Initial condition pencils (host): random buoyancy perturbation."""
        ctx = self.ctx
        b = ctx['b']
        z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
        Lz = ctx['Lz']
        b.fill_random('g', seed=seed, distribution='normal', scale=1e-3)
        b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
        X = self.pencil.gather_state(self.solver.state_flat())
        return X

    def run(self, X, n_steps):
        """Advance n_steps: first step with SBDF1 coefficients, then SBDF2
        (matching the serial MultistepIMEX startup)."""
        G, R = self.G, self.R
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        sharding3 = NamedSharding(self.mesh, P(self.axis, None, None))
        X = jax.device_put(jnp.asarray(X), sharding)
        MX1 = jax.device_put(jnp.zeros((G, R)), sharding)
        LX1 = jax.device_put(jnp.zeros((G, R)), sharding)
        F1 = jax.device_put(jnp.zeros((G, R)), sharding)
        lu2, perm2 = jax.device_put(self.lu2, sharding3), jax.device_put(self.perm2, sharding)
        lu1, perm1 = jax.device_put(self.lu1, sharding3), jax.device_put(self.perm1, sharding)
        Fs = jax.device_put(self.F_static, sharding)
        Mm = jax.device_put(self.M, sharding3)
        Lm = jax.device_put(self.L, sharding3)
        rv = jax.device_put(self.row_valid, sharding)

        def pack(coeffs):
            out = np.zeros((3, 3))
            a, b, c = coeffs
            out[0, :len(a)] = a
            out[1, :len(b)] = b
            out[2, :len(c)] = c
            return jnp.asarray(out)

        abc1, abc2 = pack(self.coeffs1), pack(self.coeffs2)
        for i in range(n_steps):
            if i == 0:
                X, MX1, LX1, F1 = self._jit_step(X, MX1, LX1, F1, abc1, lu1, perm1,
                                                 Fs, Mm, Lm, rv)
            else:
                X, MX1, LX1, F1 = self._jit_step(X, MX1, LX1, F1, abc2, lu2, perm2,
                                                 Fs, Mm, Lm, rv)
        return X
