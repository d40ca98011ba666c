"""
Bordered block-tridiagonal pencil solves (the TPU-native banded path).

The reference's large-problem strategy is banded LU/QR with the tau columns
and boundary rows handled by a Woodbury correction that SUBTRACTS only their
off-band content, keeping the band itself invertible
(dedalus/libraries/matsolvers.py:285-321; orderings dedalus.cfg:66-90).
TPU-native formulation:

  * Pencil entries are reordered mode-major (subsystems.banded_order); tau
    columns / BC rows / constant slots land in the trailing "border" block.
    The full permuted matrix is then block-tridiagonal EXCEPT for the border
    rows' and columns' far content — exactly a rank-2*nbord correction:
        A_full = A_band + U V,  U: (P, 2 nbord), V: (2 nbord, P)
  * Blocks are extracted VECTORIZED over groups from the separable stack
    representation (sum_p w[g,p] B_p) — O(G nb P) memory, never O(G P^2).
  * A_band is factored by block-tridiagonal QR (unconditionally stable
    without pivoting — no-pivot LU blows up on the nearly-upper Chebyshev
    ladder structure), vectorized over all groups on host (batched numpy).
  * The device solve is two lax.scan sweeps of batched (G,nb,nb) matvecs on
    the MXU + the Woodbury correction, with factors stored in f32 and f64
    iterative refinement against the exact blocks — machine-precision solves
    at O(G nb P) HBM traffic per step.
"""

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp
from scipy import sparse

logger = logging.getLogger(__name__)


class _Timer:
    def __init__(self, label):
        self.label = label

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *exc):
        logger.info("banded: %s took %.1fs", self.label,
                    time.perf_counter() - self.t0)


def _bmv(A, x):
    """Batched matvec over arbitrary leading dims: (..., a, b) @ (..., b).

    Lowered as broadcast-multiply + lane reduction, NOT dot_general: on TPU
    a batched tiny-matrix matvec pads each (nb, nb) operand onto (8, 128)
    MXU tiles (measured 84 ms vs 1.8 ms per banded A-apply at 512x128, a
    46x runtime penalty) and each such dot_general costs 20-100 s of remote
    compile — the round-3 cold-compile wall. The VPU form is exact f64 and
    XLA fuses the product into the reduction (no materialized intermediate).
    """
    if jax.default_backend() == 'cpu':
        # CPU BLAS matvec is fast AND keeps the sequential-MAC reduction
        # order the CPU-gated trajectory tolerances were calibrated against.
        return jnp.matmul(A, x[..., None])[..., 0]
    return (A * x[..., None, :]).sum(axis=-1)


# Factorizations below this G*Nb*nb^3 work estimate skip the on-disk cache
# (the cache exists for the single-core host QR cost at scale).
_FACTOR_CACHE_MIN_WORK = 1e8


def measure_bandwidth(A_csr, order):
    """Scalar bandwidth of the permuted INTERIOR block of one group.
    Border rows sit FIRST (their diagonal drift of n_border is included via
    the interior rows' shift); border columns sit LAST. Border-column
    content NEAR the diagonal (the tau columns' lift-row anchoring — e.g.
    the divergence tau of a first-order ball formulation) must stay
    in-band or the core is rank-deficient by the spurious pressure modes,
    so it extends the measured bandwidth; far border-column content (gauge
    constants coupling to low modes) rides the Woodbury factors instead."""
    rp, cp = order['row_perm'], order['col_perm']
    nbord = order['n_border']
    P = cp.size
    coo = A_csr.tocoo()
    rinv = np.empty(rp.size, dtype=np.int64)
    rinv[rp] = np.arange(rp.size)
    cinv = np.empty(cp.size, dtype=np.int64)
    cinv[cp] = np.arange(cp.size)
    r, c = rinv[coo.row], cinv[coo.col]
    ccore = (c >= nbord) if order.get('bcol_first') else (c < P - nbord)
    core = (r >= nbord) & ccore
    bw = int(np.abs(r[core] - c[core]).max()) if core.any() else 0
    bcol = (r >= nbord) & ~ccore
    if bcol.any():
        d = np.abs(r[bcol] - c[bcol])
        cap = max(4 * max(bw, 1), 32)
        near = d[d <= cap]
        if near.size:
            bw = max(bw, int(near.max()))
    return bw


def _permute_csr(A, order):
    rp, cp = order['row_perm'], order['col_perm']
    return A.tocsr()[rp][:, cp].tocsr()


class BandedBlocks:
    """
    Host-side representation of one pencil stack in the banded ordering:

      diag/sub/sup : (G, Nb, nb, nb)  in-pattern block-tridiagonal part of
                     the FULL permuted (padded to Nb*nb) matrix
      Ucol : (G, Pp, nbord)  border columns' out-of-pattern content
                             (border cols = LAST nbord of P)
      Vrow : (G, nbord, Pp)  border rows' out-of-pattern content
                             (border rows = FIRST nbord)

    Identity: A_full = A_band + U V with
      U = [ e_toprows | Ucol ],  V = [ Vrow ; e_rightcols^T ]
    """

    def __init__(self, diag, sub, sup, Ucol, Vrow, order, nb, pad):
        self.diag, self.sub, self.sup = diag, sub, sup
        self.Ucol, self.Vrow = Ucol, Vrow
        self.order = order
        self.nb = nb
        self.pad = pad
        self.G = diag.shape[0]
        self.Nb = diag.shape[1]
        self.Pp = self.Nb * nb          # padded size
        self.P = self.Pp - pad
        self.nbord = order['n_border']
        self.bcol0 = 0 if order.get('bcol_first') else self.P - self.nbord

    def device_arrays(self, dtype=jnp.float64):
        """Flat-packed device form: (.., nb, nb) blocks stored (.., nb*nb)
        and Ucol transposed to (G, nbord, Pp) — TPU (8,128) tiling pads
        small-minor layouts up to ~8x (see prefix_fac_profile); the flat
        forms pad to the next lane multiple only. ALL-ZERO panels are
        omitted (key absent): mass matrices typically carry no border
        content and little off-diagonal coupling, and pruning them halves
        the resident f64 operator footprint at 2048x512."""
        def flat(a):
            return a.reshape(a.shape[:-2] + (a.shape[-2] * a.shape[-1],))
        out = dict(diag=jnp.asarray(flat(self.diag), dtype=dtype))
        if np.any(self.sub):
            out['sub'] = jnp.asarray(flat(self.sub), dtype=dtype)
        if np.any(self.sup):
            out['sup'] = jnp.asarray(flat(self.sup), dtype=dtype)
        if np.any(self.Ucol):
            out['UcolT'] = jnp.asarray(np.swapaxes(self.Ucol, -1, -2),
                                       dtype=dtype)
        if np.any(self.Vrow):
            out['Vrow'] = jnp.asarray(self.Vrow, dtype=dtype)
        return out


def _split_pattern_single(A_perm, P, nb, Nb, nbord, bcol0):
    """One group: in-pattern tridiag blocks + out-of-pattern border content.
    Border ROWS sit first (indices < nbord); border COLUMNS start at bcol0
    (LAST nbord of P in the separable layout, FIRST nbord in the aligned
    exact layout). Their IN-pattern content stays in the band — in
    particular the BC-rows x low-modes block that pins the homogeneous-
    solution kernel of the interior PDE operator (reference bc_top split,
    matsolvers.py:288-301). Returns (diag, sub, sup, Ucol, Vrow) padded."""
    Pp = Nb * nb
    coo = A_perm.tocoo()
    r, c, v = coo.row, coo.col, coo.data
    br, bc = r // nb, c // nb
    in_pattern = np.abs(br - bc) <= 1
    out = ~in_pattern
    is_brow = r < nbord
    is_bcol = (c >= bcol0) & (c < bcol0 + nbord)
    stray = out & ~(is_brow | is_bcol)
    if stray.any():
        raise ValueError("interior entries outside the banded pattern")
    take_row = out & is_brow
    take_col = out & is_bcol & ~is_brow
    diag = np.zeros((Nb, nb, nb))
    sub = np.zeros((Nb, nb, nb))
    sup = np.zeros((Nb, nb, nb))
    ip = np.where(in_pattern)[0]
    bri, bci = br[ip], bc[ip]
    ri, ci, vi = r[ip] - bri * nb, c[ip] - bci * nb, v[ip]
    on_diag = bri == bci
    on_sub = bri == bci + 1
    on_sup = bci == bri + 1
    np.add.at(diag, (bri[on_diag], ri[on_diag], ci[on_diag]), vi[on_diag])
    np.add.at(sub, (bri[on_sub], ri[on_sub], ci[on_sub]), vi[on_sub])
    np.add.at(sup, (bri[on_sup], ri[on_sup], ci[on_sup]), vi[on_sup])
    Vrow = np.zeros((nbord, Pp))
    kr = np.where(take_row)[0]
    np.add.at(Vrow, (r[kr], c[kr]), v[kr])
    Ucol = np.zeros((Pp, nbord))
    kc = np.where(take_col)[0]
    np.add.at(Ucol, (r[kc], c[kc] - bcol0), v[kc])
    return diag, sub, sup, Ucol, Vrow


def build_banded_blocks(group_csr, weights, bad, order, nb, exact=None):
    """
    Build BandedBlocks vectorized over groups from the separable form
    A[g] = sum_p weights[g,p] B_p, with exact overrides for exceptional
    groups ({g: CSR}); or, when `exact` is given (a list of per-group CSRs,
    e.g. slot-split spherical pencils), split every group directly."""
    t0 = time.perf_counter()
    G = len(exact) if exact is not None else weights.shape[0]
    P = order['col_perm'].size
    nbord = order['n_border']
    bcol0 = 0 if order.get('bcol_first') else P - nbord
    Nb = -(-P // nb)
    pad = Nb * nb - P
    if exact is not None:
        parts = [_split_pattern_single(_permute_csr(Ag, order), P, nb, Nb,
                                       nbord, bcol0)
                 for Ag in exact]
        out = [np.stack([p[j] for p in parts]) for j in range(5)]
    else:
        parts = [_split_pattern_single(_permute_csr(Bp, order), P, nb, Nb,
                                       nbord, bcol0)
                 for Bp in group_csr]
        stacked = [np.stack([p[j] for p in parts]) for j in range(5)]
        # weights @ flattened-basis GEMM: numpy's c_einsum walks this
        # contraction without BLAS (measured 80s for the 5 arrays at
        # 2048x512); the reshape+matmul form is a threaded GEMM (~1s).
        out = [np.matmul(weights, s.reshape(s.shape[0], -1))
                 .reshape((weights.shape[0],) + s.shape[1:])
               for s in stacked]
        for g, Ag in bad.items():
            bg = _split_pattern_single(_permute_csr(Ag, order), P, nb, Nb,
                                       nbord, bcol0)
            for j in range(5):
                out[j][g] = bg[j]
    diag, sub, sup, Ucol, Vrow = out
    # Identity regularization of the border slots, exactly compensated
    # through the low-rank factors (A_band + U V = A_full is preserved):
    # border-row content that falls outside the band (e.g. the gauge/pivot
    # corner entries) would otherwise leave zero rows/columns in the band
    # and make it singular.
    if bcol0 == 0:
        # Aligned layout: border rows AND border columns share the top-left
        # corner, so a single identity corner entry (j, j) covers both; it
        # is compensated once, through Vrow.
        for j in range(nbord):
            blk, pos = j // nb, j % nb
            diag[:, blk, pos, pos] += 1.0
            Vrow[:, j, j] -= 1.0
    else:
        for j in range(nbord):
            blk, pos = j // nb, j % nb
            diag[:, blk, pos, pos] += 1.0          # border row j
            Vrow[:, j, j] -= 1.0
            i = P - nbord + j
            blk, pos = i // nb, i % nb
            diag[:, blk, pos, pos] += 1.0          # border col i
            Ucol[:, i, j] -= 1.0
    # Identity on padded diagonal slots so padded solves pass through
    for k in range(pad):
        diag[:, -1, nb - 1 - k, nb - 1 - k] = 1.0
    logger.info("banded: block extraction took %.1fs (G=%d, Nb=%d, nb=%d)",
                time.perf_counter() - t0, G, Nb, nb)
    return BandedBlocks(diag, sub, sup, Ucol, Vrow, order, nb, pad)


def _safe_inv(M):
    """Batched matrix inverse that flags singular members instead of
    raising: returns (inv, bad_mask) with inv[g] = 0 where singular."""
    bad = np.zeros(M.shape[0], dtype=bool)
    try:
        out = np.linalg.inv(M)
    except np.linalg.LinAlgError:
        out = np.empty_like(M)
        for g in range(M.shape[0]):
            try:
                out[g] = np.linalg.inv(M[g])
            except np.linalg.LinAlgError:
                out[g] = 0.0
                bad[g] = True
    nf = ~np.isfinite(out).all(axis=(-2, -1))
    if nf.any():
        bad |= nf
        out[nf] = 0.0
    return out, bad


def _factor_host(blocks, pin_tol=1e-8):
    """
    Block-tridiagonal QR factorization, vectorized over groups (host numpy).
    Unconditionally stable without pivoting; parity with the reference's
    BandedQR matsolver (matsolvers.py:210).

    Rank-deficient band cores are repaired by PIVOT PINNING: a (near-)zero
    diagonal entry of R is replaced by the group's running diagonal scale
    sigma, which changes the factored band by exactly sigma * (Q e_k) e_k^T
    — a rank-1 correction the caller compensates through extra Woodbury
    slots whose solved columns are just -sigma * Rhat^{-1} e_k (one back-
    substitution; Q never needs materializing). Unlike in-band unit
    placements or row/column demotion, this pins a kernel at ANY position
    (ball saddle pencils carry one exact band-core kernel per (m, ell)
    group whose anchoring lies at |row-col| ~ P). Returns the factor dict
    plus 'pins' (G, Nb, nb) bool and 'sigma' (G, Nb, nb) pin values.

    Sweep i = 0..Nb-2: QR the stacked first column [C_i; sub_{i+1}] with a
    complete (2nb x 2nb) Q, rotate the trailing panel; R acquires three block
    diagonals."""
    diag, sub, sup = blocks.diag, blocks.sub, blocks.sup
    G, Nb, nb, _ = diag.shape
    Qt = np.zeros((G, max(Nb - 1, 0), 2 * nb, 2 * nb))
    Rinv = np.zeros((G, Nb, nb, nb))
    R1 = np.zeros((G, Nb, nb, nb))
    R2 = np.zeros((G, Nb, nb, nb))
    pins = np.zeros((G, Nb, nb), dtype=bool)
    sigma = np.zeros((G, Nb, nb))
    runmax = np.zeros(G)
    singular = np.zeros(G, dtype=bool)

    def pin(Rii, i):
        nonlocal runmax
        d = np.abs(np.diagonal(Rii, axis1=1, axis2=2))       # (G, nb)
        runmax = np.maximum(runmax, d.max(axis=1))
        scale = np.maximum(runmax, 1e-300)
        p = d < pin_tol * scale[:, None]
        if p.any():
            gs, js = np.nonzero(p)
            # Exact correction: Rhat = R + (scale - old) e_j e_j^T, so the
            # factored band changes by sigma (Q e_k) e_k^T with
            # sigma = scale - old_diagonal (signed).
            old = np.diagonal(Rii, axis1=1, axis2=2)[gs, js]
            Rii[gs, js, js] = scale[gs]
            pins[gs, i, js] = True
            sigma[gs, i, js] = scale[gs] - old
        return Rii

    C = diag[:, 0].copy()
    S = sup[:, 0].copy() if Nb > 1 else np.zeros((G, nb, nb))
    for i in range(Nb - 1):
        M2 = np.concatenate([C, sub[:, i + 1]], axis=1)          # (G, 2nb, nb)
        Q, R = np.linalg.qr(M2, mode='complete')
        Qt[:, i] = Q.swapaxes(1, 2)
        Rii = pin(R[:, :nb, :].copy(), i)
        panel = np.zeros((G, 2 * nb, 2 * nb))
        panel[:, :nb, :nb] = S
        panel[:, nb:, :nb] = diag[:, i + 1]
        panel[:, nb:, nb:] = sup[:, i + 1]
        QtP = Qt[:, i] @ panel
        R1[:, i] = QtP[:, :nb, :nb]
        R2[:, i] = QtP[:, :nb, nb:]
        C = QtP[:, nb:, :nb]
        S = QtP[:, nb:, nb:]
        Rinv[:, i], b = _safe_inv(Rii)
        singular |= b
    Q, R = np.linalg.qr(C, mode='complete')
    QtL = Q.swapaxes(1, 2)
    RL = pin(R.copy(), Nb - 1)
    Rinv[:, -1], b = _safe_inv(RL)
    singular |= b
    R2[:, -2:] = 0.0
    R1[:, -1] = 0.0
    return dict(Qt=Qt, QtL=QtL, Rinv=Rinv, R1=R1, R2=R2,
                singular=singular, pins=pins, sigma=sigma)


@jax.jit
def _factor_device(diag, sub, sup, pin_tol=1e-8):
    """Device block-tridiagonal QR (lax.scan over blocks; f64 QR and
    triangular solves are TPU-supported). Returns the same dict as the host
    factorization (including pivot pins), computed in a fraction of the time
    at large G*Nb."""
    G, Nb, nb, _ = diag.shape
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=diag.dtype), (G, nb, nb))
    eye1 = jnp.eye(nb, dtype=diag.dtype)

    def tri_inv(Rii):
        return jax.lax.linalg.triangular_solve(
            Rii, eye, left_side=True, lower=False)

    def pin(Rii, runmax):
        d = jnp.abs(jnp.diagonal(Rii, axis1=1, axis2=2))
        runmax = jnp.maximum(runmax, d.max(axis=1))
        scale = jnp.maximum(runmax, 1e-300)
        p = d < pin_tol * scale[:, None]
        delta = jnp.where(
            p, scale[:, None] - jnp.diagonal(Rii, axis1=1, axis2=2), 0.0)
        Rii = Rii + delta[:, :, None] * eye1
        return Rii, p, delta, runmax

    def step(carry, inputs):
        C, S, runmax = carry
        subi, diagi, supi = inputs
        M2 = jnp.concatenate([C, subi], axis=1)          # (G, 2nb, nb)
        Q, R = jnp.linalg.qr(M2, mode='complete')
        Qt = jnp.swapaxes(Q, 1, 2)
        Rii, p, delta, runmax = pin(R[:, :nb, :], runmax)
        top = jnp.concatenate([S, jnp.zeros_like(S)], axis=2)
        bot = jnp.concatenate([diagi, supi], axis=2)
        panel = jnp.concatenate([top, bot], axis=1)      # (G, 2nb, 2nb)
        QtP = Qt @ panel
        out = (Qt, tri_inv(Rii), QtP[:, :nb, :nb], QtP[:, :nb, nb:], p, delta)
        return (QtP[:, nb:, :nb], QtP[:, nb:, nb:], runmax), out

    runmax0 = jnp.zeros(G, dtype=diag.dtype)
    (C, _, runmax), (Qt, Rinv_s, R1_s, R2_s, p_s, d_s) = jax.lax.scan(
        step, (diag[:, 0], sup[:, 0], runmax0),
        (sub[:, 1:].swapaxes(0, 1), diag[:, 1:].swapaxes(0, 1),
         sup[:, 1:].swapaxes(0, 1)))
    Q, R = jnp.linalg.qr(C, mode='complete')
    QtL = jnp.swapaxes(Q, 1, 2)
    RL, pL, dL, runmax = pin(R, runmax)
    RinvL = tri_inv(RL)
    Rinv = jnp.concatenate([Rinv_s.swapaxes(0, 1), RinvL[:, None]], axis=1)
    zero = jnp.zeros((G, 1, nb, nb), dtype=diag.dtype)
    R1 = jnp.concatenate([R1_s.swapaxes(0, 1), zero], axis=1)
    R2 = jnp.concatenate([R2_s.swapaxes(0, 1), zero], axis=1)
    pins = jnp.concatenate([p_s.swapaxes(0, 1), pL[:, None]], axis=1)
    sigma = jnp.concatenate([d_s.swapaxes(0, 1), dL[:, None]], axis=1)
    return dict(Qt=Qt.swapaxes(0, 1), QtL=QtL, Rinv=Rinv, R1=R1, R2=R2,
                pins=pins, sigma=sigma)


def _f64_factor_device():
    """Device where the jitted f64 block-QR is sound: the XLA CPU backend.
    TPU f64 QR is unusable here (the axon remote compile takes tens of
    minutes and has produced garbage factors), but the IN-PROCESS CPU
    backend is always available — even when the default backend is an
    accelerator — and the compiled scan beats the vectorized numpy sweep
    severalfold at scale (342s -> tens of s at 2048x512). None -> numpy."""
    try:
        return jax.local_devices(backend='cpu')[0]
    except Exception:
        return None


def factor_block_tridiag_qr(blocks, device=None):
    """Block-tridiagonal QR factorization of a BandedBlocks (parity with the
    reference's BandedQR matsolver, matsolvers.py:210). Runs compiled on the
    CPU backend for large batches, host numpy otherwise."""
    G, Nb, nb = blocks.G, blocks.Nb, blocks.nb
    dev = _f64_factor_device() if (G * Nb * nb ** 3 > 1e8) else None
    if device is not None:      # explicit override (tests)
        dev = _f64_factor_device() if device else None
    if dev is not None:
        put = lambda x: jax.device_put(jnp.asarray(x), dev)
        qr = _factor_device(put(blocks.diag), put(blocks.sub),
                            put(blocks.sup))
        qr = {k: np.asarray(v) for k, v in qr.items()}
    else:
        qr = _factor_host(blocks)
    if not np.isfinite(qr['Rinv']).all():
        raise ValueError("block-tridiagonal QR: singular R diagonal")
    return qr


@jax.jit
def _multi_rhs_solve_device(Qt, QtL, Rinv, R1, R2, R):
    """Device block-tridiagonal QR solve with multiple RHS: R (G,Nb,nb,k)."""
    RT = R.swapaxes(0, 1)

    def fwd(carry, inputs):
        Qti, ri = inputs
        v = jnp.concatenate([carry, ri], axis=1)
        w = Qti @ v
        nb = carry.shape[1]
        return w[:, nb:], w[:, :nb]

    carry, ys = jax.lax.scan(fwd, RT[0], (Qt.swapaxes(0, 1), RT[1:]))
    yL = QtL @ carry
    y = jnp.concatenate([ys, yL[None]])

    def bwd(carry, inputs):
        x1, x2 = carry
        Rinvi, R1i, R2i, yi = inputs
        xi = Rinvi @ (yi - R1i @ x1 - R2i @ x2)
        return (xi, x1), xi

    zero = jnp.zeros_like(RT[0])
    xN = Rinv[:, -1] @ y[-1]
    (_, _), xs = jax.lax.scan(
        bwd, (xN, zero),
        (Rinv.swapaxes(0, 1)[:-1], R1.swapaxes(0, 1)[:-1],
         R2.swapaxes(0, 1)[:-1], y[:-1]), reverse=True)
    return jnp.concatenate([xs, xN[None]]).swapaxes(0, 1)


@jax.jit
def block_tridiag_qr_solve(Qt, QtL, Rinv, R1, R2, r):
    """
    Solve via the QR factors for all groups: forward Q^T sweep + block
    back-substitution with two superdiagonals. r: (G, Nb, nb). Both sweeps
    are lax.scans of batched (G, *, *) matvecs (the MXU path).
    """
    G, Nb, nb = r.shape
    rT = r.swapaxes(0, 1)                      # (Nb, G, nb)

    def fwd(carry, inputs):
        Qti, ri1 = inputs
        v = jnp.concatenate([carry, ri1], axis=1)   # (G, 2nb)
        w = _bmv(Qti, v)
        return w[:, nb:], w[:, :nb]

    carry, ys = jax.lax.scan(fwd, rT[0], (Qt.swapaxes(0, 1), rT[1:]))
    yL = _bmv(QtL, carry)
    y = jnp.concatenate([ys, yL[None]])        # (Nb, G, nb)

    def bwd(carry, inputs):
        x1, x2 = carry                          # x_{i+1}, x_{i+2}
        Rinvi, R1i, R2i, yi = inputs
        xi = _bmv(Rinvi, yi - _bmv(R1i, x1) - _bmv(R2i, x2))
        return (xi, x1), xi

    zero = jnp.zeros((G, nb), dtype=r.dtype)
    xN = _bmv(Rinv[:, -1], y[-1])
    (x1, _), xs = jax.lax.scan(
        bwd, (xN, zero),
        (Rinv.swapaxes(0, 1)[:-1], R1.swapaxes(0, 1)[:-1],
         R2.swapaxes(0, 1)[:-1], y[:-1]), reverse=True)
    x = jnp.concatenate([xs, xN[None]])
    return x.swapaxes(0, 1)                    # (G, Nb, nb)


def _affine_prefix(A, b, reverse=False):
    """Cumulative composition of batched affine maps f_i(x) = A_i x + b_i
    along axis 0 via `jax.lax.associative_scan` (log-depth, batched GEMMs).

    reverse=False: out_i = f_i o f_{i-1} o ... o f_0
    reverse=True:  out_i = f_i o f_{i+1} o ... o f_{n-1}

    A: (n, ..., d, d), b: (n, ..., d). Returns (Acum, bcum) with the same
    shapes; apply as x_i = Acum_i @ x_anchor + bcum_i.

    Memory layout: the scan's live buffers store the matrices FLATTENED to
    (..., d*d). TPU (8, 128)-tile padding of a (..., d, d)-laid-out buffer
    wastes up to 3.5x HBM for the small odd d here (e.g. d=38 pads each
    (38, 38) block to (40, 128)); the flat vector pads d*d up to the next
    lane multiple only (1444 -> 1536, 1.06x). The (cheap, bandwidth-bound)
    reshapes to 2D happen only inside each combine's matmul. This is what
    makes the prefix solve COMPILE at 2048x512 and ball sizes on a single
    chip (round-3 OOM: f32[1024,216,38,38] temps at 3.5x expansion).
    """
    d = A.shape[-1]
    Af = A.reshape(A.shape[:-2] + (d * d,))
    Acum, bcum = _affine_prefix_flat(Af, b, d, reverse=reverse)
    return Acum.reshape(A.shape), bcum


def _affine_prefix_flat(Af, b, d, reverse=False):
    """_affine_prefix on FLAT-packed matrices Af (n, ..., d*d)."""
    def combine(x, y):
        # x = the operand nearer the scan's starting end (lower indices
        # forward, HIGHER indices under reverse=True — associative_scan
        # implements reverse as flip/scan/flip): compose as y o x, which in
        # both directions applies the anchor-adjacent maps first.
        Axf, bx = x
        Ayf, by = y
        Ax = Axf.reshape(Axf.shape[:-1] + (d, d))
        Ay = Ayf.reshape(Ayf.shape[:-1] + (d, d))
        return ((Ay @ Ax).reshape(Axf.shape), _bmv(Ay, bx) + by)

    return jax.lax.associative_scan(combine, (Af, b), reverse=reverse)


def _affine_prefix_apply(A, b, x_anchor, reverse=False, chunk=None):
    """All iterates of the affine recurrence applied to one anchor vector:
    forward: x_{i+1} = A_i x_i + b_i from x_0 = x_anchor, returning
    [x_1..x_n]; reverse: x_i = A_i x_{i+1} + b_i from x_n, returning
    [x_0..x_{n-1}]. The anchor is absorbed into the anchor-adjacent map
    (matrix zeroed, offset set to its image), so the cumulative MATRIX
    output of the prefix scan is dead code — XLA DCEs it and only the
    (n, ..., d) vector stack ever materializes at full length.

    chunk=K engages the TWO-LEVEL form: a sequential lax.scan over ceil(n/K)
    chunks, each running the log-depth prefix internally and handing the
    chunk-final iterate to the next chunk. Live prefix buffers then scale
    with K instead of n — the large-Nb memory story (2048^2 RBC, big balls)
    at C x log2(K) sequential matmul levels instead of log2(n)."""
    d = A.shape[-1]
    return _affine_prefix_apply_flat(
        A.reshape(A.shape[:-2] + (d * d,)), b, x_anchor, d,
        reverse=reverse, chunk=chunk)


def _affine_prefix_apply_flat(Af, b, x_anchor, d, reverse=False, chunk=None):
    """_affine_prefix_apply on FLAT-packed matrices Af (n, ..., d*d)."""
    n = Af.shape[0]

    def bmv_at(idx):
        return _bmv(Af[idx].reshape(Af.shape[1:-1] + (d, d)), x_anchor)

    if not chunk or n <= 2 * chunk:
        idx = -1 if reverse else 0
        b = b.at[idx].set(bmv_at(idx) + b[idx])
        Af = Af.at[idx].set(jnp.zeros_like(Af[idx]))
        _, bcum = _affine_prefix_flat(Af, b, d, reverse=reverse)
        return bcum
    K = int(chunk)
    C = -(-n // K)
    pad = C * K - n
    if pad:
        # Identity maps appended at the high end: forward, the padded
        # iterates trail past n and are sliced off; reverse, they forward
        # the anchor unchanged down to position n.
        eye = jnp.broadcast_to(jnp.eye(d, dtype=Af.dtype).reshape(d * d),
                               (pad,) + Af.shape[1:])
        Af = jnp.concatenate([Af, eye])
        b = jnp.concatenate([b, jnp.zeros((pad,) + b.shape[1:], b.dtype)])
    Ac = Af.reshape((C, K) + Af.shape[1:])
    bc = b.reshape((C, K) + b.shape[1:])

    def body(x_in, ab):
        Ai, bi = ab
        ys = _affine_prefix_apply_flat(Ai, bi, x_in, d, reverse=reverse)
        return (ys[0] if reverse else ys[-1]), ys

    _, ys = jax.lax.scan(body, x_anchor, (Ac, bc), reverse=reverse)
    ys = ys.reshape((C * K,) + ys.shape[2:])
    return ys[:n]


def _prefix_chunk(n, G, d, dtype_bytes=4):
    """Chunk size for the two-level prefix, or None for the single-level
    log-depth form. 'auto': chunk once the prefix's live flat buffers
    (measured ~7x the (n, G, d^2) base at 2048x512) would exceed the
    configured temp budget."""
    from ..utils.config import config
    raw = config.get('linear algebra', 'banded_prefix_chunk', fallback='auto')
    if raw != 'auto':
        val = int(raw)
        return val if val > 0 else None
    budget_gb = float(config.get('memory', 'banded_prefix_temp_gb',
                                 fallback='7'))
    base = n * G * d * d * dtype_bytes
    if 7 * base <= budget_gb * 1e9:
        return None
    K = int(budget_gb * 1e9 / (7 * G * d * d * dtype_bytes))
    # Over budget: the chunked form MUST engage, so keep K below the
    # caller's n <= 2*chunk single-level guard.
    return max(16, min(K, 128, n // 2))


def prefix_fac_profile(qr, dtype=None):
    """Flat-packed device profile of the QR factors for the prefix sweeps.

    TPU (8, 128) tiling pads (..., nb, nb)-minor factor buffers up to ~8x
    (measured: f32[1024,217,19,19] Rinv stored/copied at 2.54 GB vs 321 MB
    unpadded), so the prefix path ships FLAT (..., nb*nb) panels instead:
      Af/Bf/C1/C2  the four nb x nb panels of Qt (forward sweep + y),
      RinvF        flat Rinv,
      Mf           flat backward companion [[-Rinv R1, -Rinv R2], [I, 0]],
                   precomputed here because it is solve-invariant — forming
                   it per solve materialized a padded (Nb, G, 2nb, 2nb) temp.
    R1/R2 never ship to the device in this profile."""
    Qt = np.asarray(qr['Qt'])
    Rinv = np.asarray(qr['Rinv'])
    R1 = np.asarray(qr['R1'])
    R2 = np.asarray(qr['R2'])
    nb = Qt.shape[-1] // 2

    def flat(a):
        return a.reshape(a.shape[:-2] + (a.shape[-2] * a.shape[-1],))

    E = -np.matmul(Rinv[:, :-1], R1[:, :-1])
    F = -np.matmul(Rinv[:, :-1], R2[:, :-1])
    eye = np.broadcast_to(np.eye(nb, dtype=E.dtype), E.shape)
    M = np.concatenate([
        np.concatenate([E, F], axis=-1),
        np.concatenate([eye, np.zeros_like(eye)], axis=-1)], axis=-2)
    prof = dict(Af=flat(Qt[:, :, nb:, :nb]), Bf=flat(Qt[:, :, nb:, nb:]),
                C1=flat(Qt[:, :, :nb, :nb]), C2=flat(Qt[:, :, :nb, nb:]),
                QtL=np.asarray(qr['QtL']), RinvF=flat(Rinv), Mf=flat(M))
    if dtype is None:
        return prof
    return {k: jnp.asarray(v, dtype=dtype) for k, v in prof.items()}


def block_tridiag_qr_solve_prefix_fac(fac, r):
    """
    Parallel-prefix solve from a flat fac profile (see prefix_fac_profile):
    both sweeps are first-order affine recurrences, so cumulative affine
    composition (associative_scan) replaces the Nb sequential scan
    iterations with ~2 log2(Nb) levels of batched GEMMs on the MXU. On
    dispatch-latency-bound devices (~ms per scan iteration) this turns an
    O(Nb)-latency solve into an O(log Nb) one at ~2nb x the flops — flops
    the MXU has to spare.

    Stability: the forward recurrence matrices are (nb, nb) blocks of
    orthogonal Q factors (spectral norm <= 1), so forward products cannot
    grow. Backward products are bounded by the conditioning of the
    pivot-pinned triangular factor; accumulated f32 noise is mopped up by
    the caller's f64 iterative refinement (BorderedBandedSolver).
    """
    G, Nb, nb = r.shape

    def resh(a):
        return a.reshape(a.shape[:-1] + (nb, nb))

    rT = r.swapaxes(0, 1)                       # (Nb, G, nb)
    # Forward sweep: c_{i+1} = Af_i c_i + Bf_i r_{i+1}
    b = _bmv(resh(fac['Bf']).swapaxes(0, 1), rT[1:])
    carries = jnp.concatenate(
        [rT[:1], _affine_prefix_apply_flat(
            fac['Af'].swapaxes(0, 1), b, rT[0], nb,
            chunk=_prefix_chunk(Nb - 1, G, nb))])
    y = jnp.concatenate([
        _bmv(resh(fac['C1']).swapaxes(0, 1), carries[:-1])
        + _bmv(resh(fac['C2']).swapaxes(0, 1), rT[1:]),
        _bmv(fac['QtL'], carries[-1])[None]])   # (Nb, G, nb)
    # Backward sweep on s_i = [x_i; x_{i+1}]: s_i = M_i s_{i+1} + n_i
    RinvT = resh(fac['RinvF']).swapaxes(0, 1)
    xN = _bmv(RinvT[-1], y[-1])
    n_vec = jnp.concatenate(
        [_bmv(RinvT[:-1], y[:-1]), jnp.zeros((Nb - 1, G, nb), r.dtype)],
        axis=-1)
    sN = jnp.concatenate([xN, jnp.zeros_like(xN)], axis=-1)  # s_{Nb-1}
    s = _affine_prefix_apply_flat(
        fac['Mf'].swapaxes(0, 1), n_vec, sN, 2 * nb, reverse=True,
        chunk=_prefix_chunk(Nb - 1, G, 2 * nb))
    x = jnp.concatenate([s[:, :, :nb], xN[None]])
    return x.swapaxes(0, 1)                     # (G, Nb, nb)


def _blocked_K(n):
    """Within-block length for the blocked recurrence solve: K ~ sqrt(n)
    balances the K sequential phase-1 iterations against the C = n/K
    sequential anchor updates (total latency ~ K + C ~ 2 sqrt(n))."""
    return max(4, min(int(round(n ** 0.5)), 64))


def _chunk_host(a, K, C, fill=0.0):
    """(G, n, ...) host array -> (K, C, G, flat) chunk layout, padded to C*K
    along n with `fill` (scalar) or identity blocks (fill='eye')."""
    G, n = a.shape[:2]
    rest = a.shape[2:]
    pad = C * K - n
    if pad:
        if fill == 'eye':
            tail = np.broadcast_to(np.eye(rest[0], dtype=a.dtype),
                                   (G, pad) + rest)
        else:
            tail = np.full((G, pad) + rest, fill, dtype=a.dtype)
        a = np.concatenate([a, tail], axis=1)
    a = a.reshape((G, C, K) + rest)
    a = np.moveaxis(a, (2, 1, 0), (0, 1, 2))          # (K, C, G) + rest
    flat = int(np.prod(rest)) if rest else 1
    return np.ascontiguousarray(a.reshape((K, C, G, flat)))


def _chunk_vec(v, K, C):
    """(n, G, d) traced vector stack -> (K, C, G, d), zero-padded."""
    n, G, d = v.shape
    pad = C * K - n
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad, G, d), v.dtype)])
    return v.reshape(C, K, G, d).swapaxes(0, 1)


def _unchunk_vec(v, n):
    """(K, C, G, d) -> (n, G, d): inverse of _chunk_vec (drop padding)."""
    K, C, G, d = v.shape
    return v.swapaxes(0, 1).reshape(C * K, G, d)[:n]


def blocked_fac_profile(qr, dtype=None):
    """Blocked-recurrence device profile: every solve-invariant matrix
    product is precomputed HERE (factor time), so each solve reads each
    factor panel exactly ONCE and performs only batched matvecs — no
    per-solve matrix-matrix work. vs the associative-scan prefix (which
    recomposes (nb,nb) cumulative products every solve, ~3x the HBM traffic
    and ~nb x the flops), this is the bandwidth-minimal sweep form.

    Forward carry recurrence c_{t+1} = Af_t c_t + Bf_t r_{t+1} (t=0..n-1,
    n=Nb-1) splits into C blocks of K~sqrt(n):
      Mf[j,c]  = Af_{cK+j} ... Af_{cK}      within-block cumulative maps
      Afcum[c] = Mf[K-1,c]                   block-end maps
    Backward second-order recurrence x_i = E_i x_{i+1} + F_i x_{i+2} + d_i
    (reversed to forward form on pairs s_i = [x_i; x_{i+1}]):
      Tb[j,c]  = top nb rows of the companion cumulative products
      Bcum[c]  = full (2nb, 2nb) block-end companion maps (C only — small)
    All panels ship FLAT in the trailing dims ((8,128)-tile padding of
    (nb, nb)-minor buffers wastes up to ~8x HBM; see prefix_fac_profile)."""
    Qt = np.asarray(qr['Qt'], np.float64)       # (G, n, 2nb, 2nb)
    Rinv = np.asarray(qr['Rinv'], np.float64)   # (G, Nb, nb, nb)
    R1 = np.asarray(qr['R1'], np.float64)
    R2 = np.asarray(qr['R2'], np.float64)
    G, n = Qt.shape[:2]
    nb = Qt.shape[-1] // 2
    K = _blocked_K(n)
    C = -(-n // K)
    # Forward: within-block cumprods of Af (identity-padded past n)
    Af = _chunk_host(Qt[:, :, nb:, :nb], K, C, fill='eye')
    Mf = np.empty_like(Af)
    acc = Af[0].reshape(C, G, nb, nb)
    Mf[0] = acc.reshape(C, G, nb * nb)
    for j in range(1, K):
        acc = Af[j].reshape(C, G, nb, nb) @ acc
        Mf[j] = acc.reshape(C, G, nb * nb)
    # Backward: companion cumprods in REVERSED order k = (n-1) - i
    E = -np.matmul(Rinv[:, :-1], R1[:, :-1])    # (G, n, nb, nb), i-order
    F = -np.matmul(Rinv[:, :-1], R2[:, :-1])
    Eb = _chunk_host(E[:, ::-1], K, C)
    Fb = _chunk_host(F[:, ::-1], K, C)
    eye2 = np.eye(2 * nb)
    Tb = np.empty((K, C, G, nb * 2 * nb))
    acc2 = np.broadcast_to(eye2, (C, G, 2 * nb, 2 * nb)).copy()
    for j in range(K):
        comp = np.zeros((C, G, 2 * nb, 2 * nb))
        comp[:, :, :nb, :nb] = Eb[j].reshape(C, G, nb, nb)
        comp[:, :, :nb, nb:] = Fb[j].reshape(C, G, nb, nb)
        comp[:, :, nb:, :nb] = np.eye(nb)
        acc2 = comp @ acc2
        Tb[j] = acc2[:, :, :nb, :].reshape(C, G, nb * 2 * nb)
    Bcum = acc2.reshape(C, G, 4 * nb * nb)

    def flat(a):
        return a.reshape(a.shape[:-2] + (a.shape[-2] * a.shape[-1],))

    prof = dict(Af_blk=Af, Bf_blk=_chunk_host(Qt[:, :, nb:, nb:], K, C),
                Mf_blk=Mf, Afcum=np.ascontiguousarray(Mf[-1]),
                C1=flat(Qt[:, :, :nb, :nb]), C2=flat(Qt[:, :, :nb, nb:]),
                QtL=np.asarray(qr['QtL']), RinvF=flat(Rinv),
                Eb_blk=Eb, Fb_blk=Fb, Tb_blk=Tb, Bcum=Bcum)
    if dtype is None:
        return prof
    return {k: jnp.asarray(v, dtype=dtype) for k, v in prof.items()}


def block_tridiag_qr_solve_blocked_fac(fac, r):
    """Blocked-recurrence solve from a blocked_fac_profile. Per sweep:
      phase 1  K-iteration lax.scan of batched matvecs, all C blocks at
               once with zero anchors (reads each recurrence panel ONCE);
      phase 2  C-iteration anchor scan through the precomputed block-end
               maps (C ~ sqrt(Nb) tiny matvecs);
      phase 3  one batched matvec against the precomputed within-block
               cumulative maps, adding each block's anchor contribution.
    Total per solve: one read of each factor panel + O(Nb G nb) vector
    traffic, at 2 sqrt(Nb) sequential latency. Stability matches the prefix
    form (forward maps are products of orthogonal-Q subblocks, norm <= 1;
    backward products bounded by the pivot-pinned triangular conditioning;
    f32 noise absorbed by the caller's f64 refinement)."""
    G, Nb, nb = r.shape
    n = Nb - 1
    K, C = fac['Af_blk'].shape[0], fac['Af_blk'].shape[1]

    def sq(a):      # (..., d*d) -> (..., d, d)
        d = int(round(a.shape[-1] ** 0.5))
        return a.reshape(a.shape[:-1] + (d, d))

    rT = r.swapaxes(0, 1)                       # (Nb, G, nb)
    # ---- forward sweep ----
    rch = _chunk_vec(rT[1:], K, C)              # (K, C, G, nb)
    bch = _bmv(sq(fac['Bf_blk']), rch)

    def fwd_local(v, xs):
        Afj, bj = xs
        vn = _bmv(sq(Afj), v) + bj
        return vn, vn

    vK, V = jax.lax.scan(fwd_local, jnp.zeros((C, G, nb), r.dtype),
                         (fac['Af_blk'], bch))

    def fwd_anchor(a, xs):
        Ac, vc = xs
        return _bmv(sq(Ac), a) + vc, a

    _, anchors = jax.lax.scan(fwd_anchor, rT[0], (fac['Afcum'], vK))
    carr = V + _bmv(sq(fac['Mf_blk']), anchors[None])
    carries = jnp.concatenate([rT[:1], _unchunk_vec(carr, n)])
    # y from the C1/C2 panels of Qt + the last-block QtL row
    y = jnp.concatenate([
        _bmv(sq(fac['C1']).swapaxes(0, 1), carries[:-1])
        + _bmv(sq(fac['C2']).swapaxes(0, 1), rT[1:]),
        _bmv(fac['QtL'], carries[-1])[None]])   # (Nb, G, nb)
    # ---- backward sweep ----
    d = _bmv(sq(fac['RinvF']).swapaxes(0, 1), y)     # d_i = Rinv_i y_i
    xN = d[-1]
    dch = _chunk_vec(jnp.flip(d[:-1], axis=0), K, C)

    def bwd_local(pq, xs):
        Ej, Fj, dj = xs
        p, q = pq                                # x_{i+1}, x_{i+2} locals
        xl = _bmv(sq(Ej), p) + _bmv(sq(Fj), q) + dj
        return (xl, p), xl

    zero = jnp.zeros((C, G, nb), r.dtype)
    (pK, qK), Xloc = jax.lax.scan(bwd_local, (zero, zero),
                                  (fac['Eb_blk'], fac['Fb_blk'], dch))
    uK = jnp.concatenate([pK, qK], axis=-1)      # per-block final local pair

    def bwd_anchor(a, xs):
        Bc, uc = xs
        return _bmv(sq(Bc), a) + uc, a

    a0 = jnp.concatenate([xN, jnp.zeros_like(xN)], axis=-1)
    _, banchors = jax.lax.scan(bwd_anchor, a0, (fac['Bcum'], uK))
    Tb = fac['Tb_blk'].reshape(K, C, G, nb, 2 * nb)
    xrev = Xloc + _bmv(Tb, banchors[None])
    x = jnp.concatenate([jnp.flip(_unchunk_vec(xrev, n), axis=0), xN[None]])
    return x.swapaxes(0, 1)                      # (G, Nb, nb)


def block_tridiag_qr_solve_blocked(Qt, QtL, Rinv, R1, R2, r):
    """Blocked solve from raw 2D factors (tests / compatibility): builds the
    precomputed profile on the host and defers to the _fac kernel."""
    G, Nb, nb = r.shape
    if Nb < 8:
        return block_tridiag_qr_solve(Qt, QtL, Rinv, R1, R2, r)
    qr = dict(Qt=np.asarray(Qt), QtL=np.asarray(QtL), Rinv=np.asarray(Rinv),
              R1=np.asarray(R1), R2=np.asarray(R2))
    fac = blocked_fac_profile(qr, dtype=r.dtype)
    return block_tridiag_qr_solve_blocked_fac(fac, r)


def block_tridiag_qr_solve_prefix(Qt, QtL, Rinv, R1, R2, r):
    """Prefix solve from raw 2D factors (tests / compatibility): builds the
    flat profile in-trace and defers to block_tridiag_qr_solve_prefix_fac."""
    G, Nb, nb = r.shape
    if Nb < 3:
        return block_tridiag_qr_solve(Qt, QtL, Rinv, R1, R2, r)

    def flat(a):
        return a.reshape(a.shape[:-2] + (a.shape[-2] * a.shape[-1],))

    E = -jnp.matmul(Rinv[:, :-1], R1[:, :-1])
    F = -jnp.matmul(Rinv[:, :-1], R2[:, :-1])
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=r.dtype), E.shape)
    M = jnp.concatenate([
        jnp.concatenate([E, F], axis=-1),
        jnp.concatenate([eye, jnp.zeros_like(eye)], axis=-1)], axis=-2)
    fac = dict(Af=flat(Qt[:, :, nb:, :nb]), Bf=flat(Qt[:, :, nb:, nb:]),
               C1=flat(Qt[:, :, :nb, :nb]), C2=flat(Qt[:, :, :nb, nb:]),
               QtL=QtL, RinvF=flat(Rinv), Mf=flat(M))
    return block_tridiag_qr_solve_prefix_fac(fac, r)


def _sweeps_mode():
    """Sweep implementation per config/backend: sequential scans on CPU
    (cheap dispatch, minimal flops), blocked recurrence on accelerators
    (bandwidth-minimal: factor-time-precomputed cumulative maps, each
    panel read once per solve). 'prefix' (associative scan) remains
    selectable for comparison."""
    from ..utils.config import config
    mode = config.get('linear algebra', 'banded_solve', fallback='auto')
    if mode == 'auto':
        mode = 'scan' if jax.default_backend() == 'cpu' else 'blocked'
    return mode


def _solve_sweeps_fn():
    return block_tridiag_qr_solve_prefix if _sweeps_mode() == 'prefix' \
        else block_tridiag_qr_solve


def apply_band(mats, x):
    """In-pattern block-tridiagonal application (jit-safe).
    mats: device dict (flat-packed diag/sub/sup); x: (G, Nb, nb) -> same."""
    nb = x.shape[-1]

    def resh(a):
        return a.reshape(a.shape[:-1] + (nb, nb))

    y = _bmv(resh(mats['diag']), x)
    if 'sub' in mats:
        y = y.at[:, 1:].add(_bmv(resh(mats['sub'])[:, 1:], x[:, :-1]))
    if 'sup' in mats:
        y = y.at[:, :-1].add(_bmv(resh(mats['sup'])[:, :-1], x[:, 1:]))
    return y


def apply_full(mats, xflat, P, nbord, bcol0=None):
    """Exact full application A_full @ x = A_band x + U (V x) (jit-safe).
    xflat: (G, Pp) padded flat vector -> (G, Pp). Border rows first; border
    columns start at bcol0 (default: last nbord of P)."""
    G, Pp = xflat.shape
    nb = int(round(mats['diag'].shape[-1] ** 0.5))
    Nb = Pp // nb
    y = apply_band(mats, xflat.reshape(G, Nb, nb)).reshape(G, Pp)
    b0 = P - nbord if bcol0 is None else bcol0
    if 'UcolT' in mats:
        xb = xflat[:, b0:b0 + nbord]
        # (G, B, Pp) * (G, B, 1) summed over B: VPU form (see _bmv)
        if (jax.default_backend() == 'cpu'
                and mats['UcolT'].shape[0] == xflat.shape[0]):
            y = y + jnp.einsum('gbp,gb->gp', mats['UcolT'], xb)
        else:
            y = y + (mats['UcolT'] * xb[..., None]).sum(axis=1)
    if 'Vrow' in mats:
        vb = _bmv(mats['Vrow'], xflat)
        y = y.at[:, :nbord].add(vb)
    return y


def _band_dense_group(sb, g):
    """Dense (Pp, Pp) reconstruction of one group's band."""
    Pp, nb, Nb = sb.Pp, sb.nb, sb.Nb
    A = np.zeros((Pp, Pp))
    for i in range(Nb):
        r0 = i * nb
        A[r0:r0 + nb, r0:r0 + nb] = sb.diag[g, i]
        if i > 0:
            A[r0:r0 + nb, r0 - nb:r0] = sb.sub[g, i]
        if i < Nb - 1:
            A[r0:r0 + nb, r0 + nb:r0 + 2 * nb] = sb.sup[g, i]
    return A


class BorderedBandedSolver:
    """
    Device solver: f32 block-tridiagonal QR sweeps + Woodbury correction for
    the border content + f64 iterative refinement against an exact operator
    apply (parity: matsolvers.py:285-321 Woodbury over a banded core).

    The factorization runs on DEVICE in f64, chunked over groups to bound
    peak memory, and only f32 factors persist. The exact apply for
    refinement is either provided (shared banded M/L operators:
    A = a0 M + b0 L + pivots) or built from this stack's own blocks.
    """

    def __init__(self, blocks, refinements=None, factor_dtype=jnp.float32,
                 bad=None, group_dense=None, max_cond=1e7, max_cond_S=1e12,
                 max_bad=None, exact_apply=None, exact_arrs=None, chunk_G=256):
        self.blocks = blocks
        self.order = blocks.order
        self.nb = blocks.nb
        self.Nb = blocks.Nb
        # None = adaptive: measure the residual-contraction curve on a seeded
        # random RHS and take the fewest refinements reaching `solve_target`.
        self.refinements = refinements
        self.refine_curve = None
        self.factor_dtype = factor_dtype
        self.chunk_G = chunk_G
        G, P, Pp = blocks.G, blocks.P, blocks.Pp
        nbord = blocks.nbord
        bad = dict(bad or {})
        # On-disk factorization cache (parity with the poly fit cache): the
        # host QR + Woodbury assembly dominates repeat-run setup at scale.
        cpath = self._factor_cache_path(blocks, bad, max_cond, max_cond_S,
                                        factor_dtype)
        self._cpath = cpath
        if cpath is not None and cpath.exists():
            try:
                self._load_factor_cache(cpath, blocks, factor_dtype)
                self._set_exact_apply(blocks, exact_apply, exact_arrs)
                self._resolve_refinements()
                logger.info("banded: loaded cached factorization (%s)",
                            cpath.name)
                return
            except Exception:
                logger.info("banded: factor cache load failed; refactoring",
                            exc_info=True)
        # Equilibrate: two passes of row/col inf-norm scaling crush the scale
        # disparity (k^2-stiffness vs mass, mode-magnitude spread) so the f32
        # band sweeps retain enough accuracy for f64 refinement to converge.
        with _Timer('equilibrate'):
            Dr, Dc = self._equilibrate(blocks)
            sblocks = self._scaled(blocks, Dr, Dc)
        b0 = blocks.bcol0
        Ufull = np.zeros((G, Pp, 2 * nbord))
        for j in range(nbord):
            Ufull[:, j, j] = 1.0          # border rows sit at the TOP
        Ufull[:, :, nbord:] = sblocks.Ucol
        Ublocks = Ufull.reshape(G, self.Nb, self.nb, 2 * nbord)
        Vfull = np.zeros((G, 2 * nbord, Pp))
        Vfull[:, :nbord, :] = sblocks.Vrow
        for j in range(nbord):
            Vfull[:, nbord + j, b0 + j] = 1.0

        Vfull0 = Vfull.copy()
        with _Timer('factor+W1 (pass 1)'):
            qr, W1, sing, pin_cols = self._chunked_factor_W1(
                self._neutralized(sblocks, bad), Ublocks)
        # Rank-deficient band cores (e.g. ball saddle pencils: one exact
        # kernel per (m, ell) group anchored only at |row-col| ~ P) are
        # repaired by PIVOT PINNING inside the QR sweeps: the factored band
        # becomes Bhat = B + sum_k sigma_k (Q e_k) e_k^T, compensated here
        # exactly through extra Woodbury slots with solved columns
        # -sigma_k Rhat^{-1} e_k — no refactorization, works at any kernel
        # position (in-band unit placements and row/column demotion cannot
        # bridge a kernel whose left/right supports are band-disjoint).
        def extend_with_pins(W1, Vfull, pin_cols):
            if not pin_cols:
                return W1, Vfull
            K = max(ks.size for ks, _ in pin_cols.values())
            W1ex = np.zeros((G, Pp, K))
            Vex = np.zeros((G, K, Pp))
            for g, (ks, cols) in pin_cols.items():
                W1ex[g, :, :ks.size] = cols
                for m, k in enumerate(ks):
                    Vex[g, m, k] = 1.0
            npin = sum(ks.size for ks, _ in pin_cols.values())
            logger.info("banded: pinned %d rank-deficient pivots across %d "
                        "groups (max %d per group)", npin, len(pin_cols), K)
            return (np.concatenate([W1, W1ex], axis=2),
                    np.concatenate([Vfull, Vex], axis=1))

        W1, Vfull = extend_with_pins(W1, Vfull, pin_cols)
        still = [int(g) for g in np.nonzero(sing)[0] if int(g) not in bad]
        if still:                           # pinning missed: dense overrides
            if group_dense is None:
                raise ValueError(
                    "singular band core and no dense group provider")
            limit = max_bad if max_bad is not None else max(16, G // 4)
            limit = min(limit, int(2e9 / max(P * P * 4, 1)) + 1)
            if len(still) + len(bad) > limit:
                raise ValueError(
                    f"banded core is rank-deficient in {len(still)} "
                    f"groups (limit {limit}); this pencil needs a dense "
                    f"or matrix-free solver")
            logger.info("banded: %d groups stay singular after pinning; "
                        "dense overrides", len(still))
            for g in still:
                bad[g] = group_dense(g)
            with _Timer('factor+W1 (pass 1b)'):
                qr, W1, sing, pin_cols = self._chunked_factor_W1(
                    self._neutralized(sblocks, bad), Ublocks)
            Vfull = Vfull0
            W1, Vfull = extend_with_pins(W1, Vfull, pin_cols)
        B = W1.shape[2]
        S = np.eye(B) + Vfull @ W1
        # Dense-override groups whose scaled band or capacitance matrix stays
        # ill-conditioned (the tau band loses conditioning as k -> 0; the
        # count is k-local and small at scale).
        growth = np.abs(qr['Rinv']).max(axis=(1, 2, 3))
        with np.errstate(all='ignore'):
            condS = np.linalg.cond(np.where(np.isfinite(S), S, 0.0))
        self.diagnostics = dict(growth=growth.copy(), condS=condS.copy(),
                                S_finite=np.isfinite(S).all(axis=(1, 2)))
        # growth gates the f32 band factors (error ~ growth * eps32);
        # condS gates the f64 Woodbury capacitance (error ~ condS * eps64,
        # contracted by the refinement passes) — hence the looser threshold.
        ill = np.nonzero((growth > max_cond) | (condS > max_cond_S)
                         | ~np.isfinite(condS)
                         | ~np.isfinite(S).all(axis=(1, 2)))[0]
        ill = [int(g) for g in ill if g not in bad]
        if ill:
            if group_dense is None:
                raise ValueError(
                    f"{len(ill)} ill-conditioned band groups but no dense "
                    f"group provider")
            # The ill count is k-local (small-wavenumber groups), not a
            # fraction of G; cap by count and by dense-override memory.
            limit = max_bad if max_bad is not None else max(16, G // 16)
            limit = min(limit, int(2e9 / max(P * P * 4, 1)) + 1)
            if len(ill) + len(bad) > limit:
                raise ValueError(
                    f"too many ill-conditioned band groups "
                    f"({len(ill) + len(bad)}/{G})")
            logger.info("banded: %d ill-conditioned groups get dense overrides",
                        len(ill))
            with _Timer('dense overrides + refactor'):
                for g in ill:
                    bad[g] = group_dense(int(g))
                qr, W1, _, pin_cols = self._chunked_factor_W1(
                    self._neutralized(sblocks, bad), Ublocks)
            Vfull = Vfull0
            W1, Vfull = extend_with_pins(W1, Vfull, pin_cols)
            B = W1.shape[2]
            S = np.eye(B) + Vfull @ W1
        self.bad_idx = tuple(sorted(bad))
        for g in self.bad_idx:   # bad groups solve densely; keep S invertible
            S[g] = np.eye(B)
            W1[g] = 0.0
        Sinv = np.linalg.inv(S)
        if not np.isfinite(Sinv).all():
            raise ValueError("Woodbury capacitance matrix is singular")
        if self.bad_idx:
            rp = np.asarray(self.order['row_perm'])
            cp = np.asarray(self.order['col_perm'])
            Abad = np.stack(
                [np.asarray(sparse.csr_matrix(bad[g])[rp][:, cp].todense())
                 for g in self.bad_idx])
            # Scaled dense override: solves the equilibrated system
            Abad = Dr[list(self.bad_idx), :P, None] * Abad \
                * Dc[list(self.bad_idx), None, :P]
            if Abad.shape[-1] > 1024:
                # Large pencils: batched f32 LU inverse on device
                with _Timer(f'dense inverses ({Abad.shape[0]} groups)'):
                    self.Abad_inv = jnp.linalg.inv(
                        jnp.asarray(Abad, dtype=jnp.float32)).astype(factor_dtype)
            else:
                self.Abad_inv = jnp.asarray(np.linalg.inv(Abad),
                                            dtype=factor_dtype)
        else:
            self.Abad_inv = None
        self.fac = self._ship_fac(qr, factor_dtype)
        # Pinned-pivot repair columns and ill-conditioned capacitance need
        # f64 Woodbury factors: their apply noise is amplified by the border
        # conditioning (~eps * cond), and at f32 that puts a ~1e-9 FLOOR
        # under the refinement (measured: ball saddle trajectories stall at
        # 3.5e-9 vs 2e-10 with f64). Well-conditioned borders (e.g. RBC tau
        # columns) keep the f32 memory win.
        condS = self.diagnostics['condS']
        wb_dtype = np.float64 if (pin_cols or np.nanmax(
            np.where(np.isfinite(condS), condS, np.inf)) > 1e7) \
            else factor_dtype
        self._wb_dtype = wb_dtype
        # Groups that actually NEED the f64 correction (pins / ill
        # capacitance, 1e6 for margin below the 1e7 dtype gate); the
        # conditioning is k-local, so this is a handful of groups at scale
        # and accelerators ship f32 + an f64 fix-up for just these.
        illc = ~np.isfinite(condS) | (condS > 1e6)
        self._illg = sorted(
            ({int(g) for g in np.nonzero(illc)[0]}
             | {int(g) for g in (pin_cols or ())}) - set(self.bad_idx))
        self.fac.update(
            self._ship_woodbury(W1, Sinv, Vfull, wb_dtype, self._illg))
        rp = np.asarray(self.order['row_perm'])
        cp = np.asarray(self.order['col_perm'])
        self.row_perm = jnp.asarray(rp)
        cinv = np.empty_like(cp)
        cinv[cp] = np.arange(cp.size)
        self.col_unperm = jnp.asarray(cinv)
        self.Dr = jnp.asarray(Dr)
        self.Dc = jnp.asarray(Dc)
        self.P = P
        self.nbord = nbord
        self.pad = blocks.pad
        self._set_exact_apply(blocks, exact_apply, exact_arrs)
        # Persist the finished factors BEFORE the refinement probe: the probe
        # compiles a full solve program and can fail (e.g. HBM pressure on a
        # new config), and that must not discard minutes of host factor work.
        if cpath is not None:
            try:
                with _Timer('factor cache save'):
                    self._save_factor_cache(cpath, qr, W1, Sinv, Vfull, Dr, Dc)
            except Exception:
                logger.info("banded: factor cache save failed", exc_info=True)
        self._resolve_refinements()

    def _set_exact_apply(self, blocks, exact_apply, exact_arrs):
        """Exact apply for refinement (f64): shared operators or own blocks."""
        if exact_apply is None:
            own = BandedOperator(blocks)
            exact_apply = own.apply_fn()
            exact_arrs = own.arrs
        self.exact_apply = exact_apply
        self.exact_arrs = exact_arrs

    @staticmethod
    def _factor_cache_path(blocks, bad, max_cond, max_cond_S, factor_dtype):
        """On-disk cache location for a finished factorization, keyed by the
        full matrix content (band + border reconstruct A_full exactly) and
        the conditioning gates. Only engaged when the factor work is large
        enough to matter (the QR sweeps run on a single-core host)."""
        from ..utils.config import config
        if not config.getboolean('memory', 'cache_banded_factors',
                                 fallback=True):
            return None
        if blocks.G * blocks.Nb * blocks.nb ** 3 < _FACTOR_CACHE_MIN_WORK:
            return None
        import hashlib
        import os
        import pathlib
        base = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
        try:
            d = pathlib.Path(base)
            d.mkdir(parents=True, exist_ok=True)
        except Exception:
            return None
        h = hashlib.sha1()
        # v3: caches persist the full ill-group set (pins + ill capacitance)
        # in `illg`; v2 caches from before pin support could be loaded with
        # an incomplete f64 fix-up set on accelerators, so they are retired
        # by the version bump and re-factored instead.
        h.update(b'bandedfac-v3')
        for arr in (blocks.diag, blocks.sub, blocks.sup,
                    blocks.Ucol, blocks.Vrow):
            h.update(np.ascontiguousarray(arr).tobytes())
        h.update(np.ascontiguousarray(blocks.order['row_perm']).tobytes())
        h.update(np.ascontiguousarray(blocks.order['col_perm']).tobytes())
        h.update(np.asarray(
            [blocks.order['n_border'],
             1 if blocks.order.get('bcol_first') else 0,
             blocks.nb, blocks.pad], dtype=np.int64).tobytes())
        h.update(np.asarray([max_cond, max_cond_S],
                            dtype=np.float64).tobytes())
        h.update(str(np.dtype(factor_dtype)).encode())
        for g in sorted(bad):
            h.update(np.int64(g).tobytes())
            m = bad[g]
            if sparse.issparse(m):
                m = m.tocsr()
                h.update(m.data.tobytes())
                h.update(m.indices.tobytes())
                h.update(m.indptr.tobytes())
            else:
                h.update(np.ascontiguousarray(m).tobytes())
        return d / f"bandedfac_{h.hexdigest()[:20]}.npz"

    def _save_factor_cache(self, cpath, qr, W1, Sinv, Vfull, Dr, Dc):
        # qr factors are consumed at factor_dtype (f32 by default; the cache
        # path is keyed by it) — saving them f64 doubles disk and save/load
        # wall for bits the solver never reads. Woodbury pieces stay f64.
        data = {f"qr_{k}": np.asarray(v, dtype=self.factor_dtype)
                for k, v in qr.items()}
        data.update(
            # W1/Vfull ship at the shipping dtype (see _ship_woodbury: f64
            # when pins / ill-conditioned borders set the refinement floor,
            # factor_dtype otherwise); the load path infers from the dtype
            W1=np.asarray(W1, dtype=self._wb_dtype),
            Sinv=np.asarray(Sinv),
            Vfull=np.asarray(Vfull, dtype=self._wb_dtype),
            Dr=np.asarray(Dr), Dc=np.asarray(Dc),
            bad_idx=np.asarray(self.bad_idx, dtype=np.int64),
            illg=np.asarray(getattr(self, '_illg', []), dtype=np.int64),
            growth=self.diagnostics['growth'],
            condS=self.diagnostics['condS'],
            Abad_inv=(np.asarray(self.Abad_inv)
                      if self.Abad_inv is not None
                      else np.zeros((0,), np.float32)))
        tmp = cpath.with_suffix('.tmp.npz')
        np.savez(tmp, **data)
        tmp.replace(cpath)

    def _ship_fac(self, qr, factor_dtype):
        """Device fac dict for the selected sweep mode: blocked ships the
        precomputed-cumulative-map chunk panels (blocked_fac_profile),
        prefix ships the flat-packed profile (R1/R2 never reach the device;
        see prefix_fac_profile), scan ships the raw 2D factors."""
        mode = _sweeps_mode()
        if mode == 'blocked' and self.Nb >= 8:
            return blocked_fac_profile(qr, dtype=factor_dtype)
        if mode in ('prefix', 'blocked') and self.Nb >= 3:
            return prefix_fac_profile(qr, dtype=factor_dtype)
        return {k: jnp.asarray(v, dtype=factor_dtype) for k, v in qr.items()}

    @staticmethod
    def _ship_woodbury(W1, Sinv, Vfull, wb_dtype, ill_groups=()):
        """Woodbury device pieces, by conditioning (wb_dtype was decided at
        factor time):

        * factor_dtype (well-conditioned borders, e.g. RBC tau columns):
          W1 ships TRANSPOSED (G, B, Pp) — the (G, Pp, B) layout tile-pads
          B -> 128 lanes (~5x HBM at 2048x512) — and the apply noise is
          direct-solve noise the f64 refinement absorbs.
        * f64 (pinned pivots / ill-conditioned capacitance): on CPU W1 ships
          UNTRANSPOSED f64 and the apply runs all-f64 (_once_fn) — pinned
          ball-saddle trajectories are sensitive at the refinement floor
          even to the f64 contraction ORDER of the correction (measured:
          3.5e-9 vs 2e-10 against LU with the transposed einsum).
          Accelerators instead ship the f32 layout for ALL groups plus an
          f64 fix-up restricted to `ill_groups` (the k-local pins /
          ill-capacitance set): the f64 need is per-GROUP, and shipping
          (G, Pp, B) f64 twice costs ~1.8 GB at 2048x512 while the ill
          subset is a few MB."""
        from ..utils.config import config
        mode = config.get('linear algebra', 'woodbury_two_tier',
                          fallback='auto')
        if np.dtype(wb_dtype) == np.float64:
            G = np.asarray(W1).shape[0]
            two_tier = (mode == 'force'
                        or (mode == 'auto'
                            and jax.default_backend() != 'cpu'))
            ill_cap = G if mode == 'force' else max(1, G // 8)
            if two_tier and len(ill_groups) <= ill_cap:
                d = dict(
                    W1T=jnp.asarray(np.swapaxes(np.asarray(W1), 1, 2),
                                    dtype=jnp.float32),
                    Sinv=jnp.asarray(Sinv),
                    Vfull=jnp.asarray(Vfull, dtype=jnp.float32))
                if len(ill_groups):
                    ig = np.asarray(sorted(ill_groups), dtype=np.int32)
                    d.update(
                        illg=jnp.asarray(ig),
                        W1ill=jnp.asarray(np.asarray(W1)[ig],
                                          dtype=jnp.float64),
                        Vill=jnp.asarray(np.asarray(Vfull)[ig],
                                         dtype=jnp.float64))
                return d
            return dict(W1=jnp.asarray(np.asarray(W1), dtype=jnp.float64),
                        Sinv=jnp.asarray(Sinv),
                        Vfull=jnp.asarray(Vfull, dtype=jnp.float64))
        return dict(
            W1T=jnp.asarray(np.swapaxes(np.asarray(W1), 1, 2),
                            dtype=wb_dtype),
            Sinv=jnp.asarray(Sinv),
            Vfull=jnp.asarray(Vfull, dtype=wb_dtype))

    def _load_factor_cache(self, cpath, blocks, factor_dtype):
        z = np.load(cpath)
        self.fac = self._ship_fac(
            {k[3:]: z[k] for k in z.files if k.startswith('qr_')},
            factor_dtype)
        # Woodbury dtype was decided at factor time (f64 for pinned /
        # ill-conditioned borders) and is recorded in the saved arrays
        self._wb_dtype = z['W1'].dtype
        self.bad_idx = tuple(int(g) for g in z['bad_idx'])
        # v3 caches always persist the full ill-group set (pins + ill
        # capacitance); the version bump retired v2 caches whose set could
        # be incomplete for pinned problems.
        self._illg = [int(g) for g in z['illg']]
        self.fac.update(self._ship_woodbury(z['W1'], z['Sinv'], z['Vfull'],
                                            z['W1'].dtype, self._illg))
        Abad_inv = z['Abad_inv']
        self.Abad_inv = (jnp.asarray(Abad_inv, dtype=factor_dtype)
                         if Abad_inv.size else None)
        self.diagnostics = dict(growth=np.asarray(z['growth']),
                                condS=np.asarray(z['condS']),
                                S_finite=np.isfinite(
                                    np.asarray(z['condS'])))
        rp = np.asarray(self.order['row_perm'])
        cp = np.asarray(self.order['col_perm'])
        self.row_perm = jnp.asarray(rp)
        cinv = np.empty_like(cp)
        cinv[cp] = np.arange(cp.size)
        self.col_unperm = jnp.asarray(cinv)
        self.Dr = jnp.asarray(z['Dr'])
        self.Dc = jnp.asarray(z['Dc'])
        self.P = blocks.P
        self.nbord = blocks.nbord
        self.pad = blocks.pad

    def _chunked_factor_W1(self, fblocks, Ublocks):
        """f64 factorization + Woodbury RHS solves on device, chunked over
        groups to bound peak HBM; returns (f32 factors, f64 W1 (host),
        singular-core mask (G,), pinned-pivot columns {g: (ks, cols)})."""
        G = fblocks.G
        chunk = max(1, min(self.chunk_G, G))
        qr_parts, W1_parts, sing_parts = [], [], []
        pin_cols = {}
        dev = (_f64_factor_device()
               if G * self.Nb * self.nb ** 3 > 1e8 else None)
        for g0 in range(0, G, chunk):
            sl = slice(g0, min(g0 + chunk, G))
            if dev is not None:
                put = lambda x: jax.device_put(jnp.asarray(x), dev)
                qr64 = _factor_device(put(fblocks.diag[sl]),
                                      put(fblocks.sub[sl]),
                                      put(fblocks.sup[sl]))
                W1c = _multi_rhs_solve_device(
                    qr64['Qt'], qr64['QtL'], qr64['Rinv'], qr64['R1'],
                    qr64['R2'], put(Ublocks[sl]))
                qr64 = {k: np.asarray(v) for k, v in qr64.items()}
                pins = qr64.pop('pins')
                sigma = qr64.pop('sigma')
                if pins.any():
                    pin_cols.update(self._pin_columns(qr64, pins, sigma, g0))
                Rh = qr64['Rinv']
                sing_parts.append(~np.isfinite(Rh).all(axis=(1, 2, 3))
                                  | (np.abs(np.where(np.isfinite(Rh), Rh, 0.0)
                                            ).max(axis=(1, 2, 3)) > 1e30))
                qr_parts.append({k: np.asarray(v, dtype=np.float32)
                                 for k, v in qr64.items()})
                W1_parts.append(np.asarray(W1c))
                del qr64, W1c
            else:
                sub = BandedBlocks(fblocks.diag[sl], fblocks.sub[sl],
                                   fblocks.sup[sl], fblocks.Ucol[sl],
                                   fblocks.Vrow[sl], fblocks.order,
                                   fblocks.nb, fblocks.pad)
                qr64 = _factor_host(sub)
                sing_parts.append(qr64.pop('singular'))
                pins = qr64.pop('pins')
                sigma = qr64.pop('sigma')
                if pins.any():
                    pin_cols.update(self._pin_columns(qr64, pins, sigma, g0))
                W1_parts.append(self._host_core_solve(qr64, Ublocks[sl]))
                qr_parts.append({k: np.asarray(v, dtype=np.float32)
                                 for k, v in qr64.items()})
        qr = {k: np.concatenate([p[k] for p in qr_parts])
              for k in qr_parts[0]}
        qr['Rinv'] = np.where(np.isfinite(qr['Rinv']), qr['Rinv'],
                              np.float32(0.0))
        W1 = np.concatenate(W1_parts).reshape(G, fblocks.Pp, -1)
        W1 = np.where(np.isfinite(W1), W1, 0.0)
        return qr, W1, np.concatenate(sing_parts), pin_cols

    @staticmethod
    def _neutralized(blocks, bad):
        """Copy of the blocks with bad groups' band replaced by identity
        (they solve through dense overrides; keeps the batch factorable)."""
        if not bad:
            return blocks
        fb = BandedBlocks(
            blocks.diag.copy(), blocks.sub.copy(), blocks.sup.copy(),
            blocks.Ucol, blocks.Vrow, blocks.order, blocks.nb, blocks.pad)
        for g in bad:
            fb.diag[g] = np.eye(blocks.nb)
            fb.sub[g] = 0.0
            fb.sup[g] = 0.0
        return fb

    @staticmethod
    def _equilibrate(blocks, passes=2):
        """Inf-norm row/col scaling vectors (G, Pp) for the BAND content.

        Scaling by the band alone (not Ucol/Vrow) keeps the factorable core
        well-conditioned: border rows whose content is mostly OUT of the
        band pattern (dense BC rows at large N) would otherwise be scaled
        toward zero in-band, making the band singular. The unscaled border
        magnitudes land in the f64 Woodbury factors (W1/S), which tolerate
        them."""
        G, Pp = blocks.G, blocks.Pp
        nb, Nb = blocks.nb, blocks.Nb
        # f64 throughout: f32 scale factors measurably degrade the f32
        # factored band's accuracy on ill-conditioned ball-saddle groups
        # (trajectory error 2e-10 -> 2e-9 at (16, 8, 32)).
        adiag = np.abs(blocks.diag)
        asub = np.abs(blocks.sub[:, 1:])
        asup = np.abs(blocks.sup[:, :-1])
        Dr = np.ones((G, Nb, nb))
        Dc = np.ones((G, Nb, nb))
        for _ in range(passes):
            rmax = np.zeros((G, Nb, nb))
            cmax = np.zeros((G, Nb, nb))
            # diag: rows block i, cols block i
            a = Dr[:, :, :, None] * adiag * Dc[:, :, None, :]
            rmax = np.maximum(rmax, a.max(axis=3))
            cmax = np.maximum(cmax, a.max(axis=2))
            if Nb > 1:
                # sub: rows block i (i>=1), cols block i-1
                a = Dr[:, 1:, :, None] * asub * Dc[:, :-1, None, :]
                rmax[:, 1:] = np.maximum(rmax[:, 1:], a.max(axis=3))
                cmax[:, :-1] = np.maximum(cmax[:, :-1], a.max(axis=2))
                # sup: rows block i (i<Nb-1), cols block i+1
                a = Dr[:, :-1, :, None] * asup * Dc[:, 1:, None, :]
                rmax[:, :-1] = np.maximum(rmax[:, :-1], a.max(axis=3))
                cmax[:, 1:] = np.maximum(cmax[:, 1:], a.max(axis=2))
            Dr /= np.sqrt(np.where(rmax > 0, rmax, 1.0))
            Dc /= np.sqrt(np.where(cmax > 0, cmax, 1.0))
        return Dr.reshape(G, Pp), Dc.reshape(G, Pp)

    @staticmethod
    def _scaled(blocks, Dr, Dc):
        """Apply the equilibration scaling to all block arrays."""
        G, Pp, nb, Nb = blocks.G, blocks.Pp, blocks.nb, blocks.Nb
        P, nbord = blocks.P, blocks.nbord
        DrB = Dr.reshape(G, Nb, nb)
        DcB = Dc.reshape(G, Nb, nb)
        diag = blocks.diag * DrB[:, :, :, None] * DcB[:, :, None, :]
        sub = blocks.sub.copy()
        sub[:, 1:] = (blocks.sub[:, 1:] * DrB[:, 1:, :, None]
                      * DcB[:, :-1, None, :])
        sup = blocks.sup.copy()
        sup[:, :-1] = (blocks.sup[:, :-1] * DrB[:, :-1, :, None]
                       * DcB[:, 1:, None, :])
        b0 = blocks.bcol0
        Ucol = blocks.Ucol * Dr[:, :, None] * Dc[:, None, b0:b0 + nbord]
        Vrow = blocks.Vrow * Dr[:, :nbord, None] * Dc[:, None, :]
        return BandedBlocks(diag, sub, sup, Ucol, Vrow, blocks.order,
                            blocks.nb, blocks.pad)

    @staticmethod
    def _host_back_solve(qr, Y):
        """Back-substitution only (x = Rhat^{-1} y), multiple RHS:
        Y (G,Nb,nb,k). Used for the pinned-pivot Woodbury columns
        -sigma * Rhat^{-1} e_k (the Q sweeps cancel: Bhat^{-1} Q = Rhat^{-1})."""
        G, Nb, nb, k = Y.shape
        Rinv, R1, R2 = qr['Rinv'], qr['R1'], qr['R2']
        x = np.zeros_like(Y)
        x[:, -1] = Rinv[:, -1] @ Y[:, -1]
        if Nb > 1:
            x[:, -2] = Rinv[:, -2] @ (Y[:, -2] - R1[:, -2] @ x[:, -1])
        for i in range(Nb - 3, -1, -1):
            x[:, i] = Rinv[:, i] @ (Y[:, i] - R1[:, i] @ x[:, i + 1]
                                    - R2[:, i] @ x[:, i + 2])
        return x

    def _pin_columns(self, qr64, pins, sigma, g0):
        """Extra Woodbury data for pinned pivots of one factor chunk:
        {global g: (flat positions, -sigma * Rhat^{-1} e_k columns (Pp, kg))}.
        qr64 arrays are host f64."""
        out = {}
        Gc, Nb, nb = pins.shape
        for gl in np.nonzero(pins.any(axis=(1, 2)))[0]:
            ks = np.nonzero(pins[gl].reshape(-1))[0]
            Y = np.zeros((1, Nb, nb, ks.size))
            for m, k in enumerate(ks):
                Y[0, k // nb, k % nb, m] = 1.0
            sub = {key: qr64[key][gl:gl + 1] for key in ('Rinv', 'R1', 'R2')}
            x = self._host_back_solve(sub, Y)[0]          # (Nb, nb, kg)
            cols = -sigma[gl].reshape(-1)[ks] * x.reshape(Nb * nb, ks.size)
            out[g0 + int(gl)] = (ks, cols)
        return out

    @staticmethod
    def _host_core_solve(qr, R):
        """Host block-tridiagonal QR solve, multiple RHS: R (G,Nb,nb,k)."""
        G, Nb, nb, k = R.shape
        Qt, QtL = qr['Qt'], qr['QtL']
        Rinv, R1, R2 = qr['Rinv'], qr['R1'], qr['R2']
        y = np.zeros_like(R)
        carry = R[:, 0]
        for i in range(Nb - 1):
            v = np.concatenate([carry, R[:, i + 1]], axis=1)   # (G, 2nb, k)
            w = Qt[:, i] @ v
            y[:, i] = w[:, :nb]
            carry = w[:, nb:]
        y[:, -1] = QtL @ carry
        x = np.zeros_like(R)
        x[:, -1] = Rinv[:, -1] @ y[:, -1]
        if Nb > 1:
            x[:, -2] = Rinv[:, -2] @ (y[:, -2] - R1[:, -2] @ x[:, -1])
        for i in range(Nb - 3, -1, -1):
            x[:, i] = Rinv[:, i] @ (y[:, i] - R1[:, i] @ x[:, i + 1]
                                    - R2[:, i] @ x[:, i + 2])
        return x

    def solve_arrays(self):
        """All device arrays for the jit-safe solve (passed as arguments)."""
        arrs = dict(fac=self.fac, ex=self.exact_arrs,
                    row_perm=self.row_perm, col_unperm=self.col_unperm,
                    Dr=self.Dr, Dc=self.Dc)
        if self.Abad_inv is not None:
            arrs['Abad_inv'] = self.Abad_inv
        return arrs

    def program_key(self):
        """Structural signature of the compiled solve program. Every array
        VALUE reaches the solve as a runtime argument (solve_arrays), so two
        factorizations with equal keys lower to identical HLO: the key covers
        exactly the statics baked into the solve closure (refinement count,
        bad-group indices, sweep/shipping mode via the fac dict keys) plus
        the argument pytree structure. Compiled run programs can then be
        shared across (a0, b0) factorization keys — e.g. a scheme's startup
        and main factorizations — instead of paying one large remote compile
        each."""
        leaves, struct = jax.tree_util.tree_flatten(self.solve_arrays())
        sig = tuple((tuple(x.shape), str(x.dtype)) for x in leaves)
        return (self.refinements, tuple(self.bad_idx), _sweeps_mode(),
                str(struct), sig)

    def _resolve_refinements(self):
        """Never-fatal wrapper: a probe failure (compile OOM on a new
        config, serving hiccup) must not discard finished factors — fall
        back to the conservative default count."""
        try:
            self._resolve_refinements_inner()
        except Exception:
            if self.refinements is None:
                self.refinements = 4
            logger.info("banded: refinement probe failed; using %d passes",
                        self.refinements, exc_info=True)

    def _resolve_refinements_inner(self):
        """Adaptive refinement count: fewest passes whose measured residual
        curve reaches the configured solve target (probed on a seeded random
        RHS at factor time). The curve is persisted in a per-PLATFORM sidecar
        next to the factor cache: the contraction rate depends on the
        backend's f32 matmul precision (TPU != CPU), so a curve probed on one
        platform must not be reused on another."""
        if self.refinements is not None:
            return
        import jax
        from ..utils.config import config
        target = float(config.get('linear algebra', 'solve_target',
                                  fallback='1e-15'))
        # Curves depend on the backend's f32 matmul precision AND on the
        # Woodbury shipping mode (all-f64 vs two-tier f32+fix-up): a curve
        # probed under one shipping must not select the pass count for the
        # other, so the sidecar key carries both.
        ship = ('f64' if 'W1' in self.fac
                else 'tt' if 'illg' in self.fac else 'f32')
        platform = f"{jax.default_backend()}-{ship}"
        if self.refine_curve is None:
            blocks = self.blocks
            if blocks.G * blocks.Nb * blocks.nb ** 3 < _FACTOR_CACHE_MIN_WORK:
                # Tiny systems: the probe's compile costs more than the
                # refinements it could save; use the conservative default.
                self.refinements = 4
                return
            self.refine_curve = self._load_curve_sidecar(platform)
        if self.refine_curve is None:
            with _Timer('refinement probe'):
                self.refine_curve = self._probe_refinement_curve()
            self._save_curve_sidecar(platform, self.refine_curve)
        curve = np.asarray(self.refine_curve)
        # Refinement stagnates at the conditioning-set f64 floor; when the
        # target sits below that floor, extra passes buy nothing. The plateau
        # is NOISY (rounding jitter of a few x between passes), so "within
        # 10% of the min" can land only on the argmin — the cap. Instead:
        # enter the plateau at 2x the floor, then keep refining only while a
        # pass still contracts the residual by >1.3x (protects the
        # ill-conditioned ball-saddle curves where an extra pass past the 2x
        # mark buys a real order of magnitude).
        floor = float(curve.min())
        thresh = max(target, 2.0 * floor)
        if floor > target:
            logger.info("banded: probe floor %.2e misses solve target %.0e",
                        floor, target)
        refs = int(np.nonzero(curve <= thresh)[0][0])
        # Extend only while the target is still unmet: once curve[refs]
        # <= target, additional contracting passes buy nothing the solve
        # asked for (tolerant targets would otherwise pay them every step).
        while (refs + 1 < curve.shape[0] and curve[refs] > target
               and curve[refs + 1] < curve[refs] / 1.3):
            refs += 1
        self.refinements = max(1, refs)
        logger.info("banded: adaptive refinements=%d (residual curve %s)",
                    self.refinements,
                    np.array2string(curve, precision=1, separator=','))

    def _curve_sidecar_path(self):
        if getattr(self, '_cpath', None) is None:
            return None
        return self._cpath.with_name(self._cpath.stem + '.curves.npz')

    def _load_curve_sidecar(self, platform):
        path = self._curve_sidecar_path()
        if path is None or not path.exists():
            return None
        try:
            z = np.load(path)
            return z[platform] if platform in z.files else None
        except Exception:
            return None

    def _save_curve_sidecar(self, platform, curve):
        path = self._curve_sidecar_path()
        if path is None:
            return
        data = {}
        try:
            if path.exists():
                with np.load(path) as z:
                    data = {k: z[k] for k in z.files}
        except Exception:
            pass
        data[platform] = np.asarray(curve)
        try:
            tmp = path.with_suffix('.tmp.npz')
            np.savez(tmp, **data)
            tmp.replace(path)
        except Exception:
            logger.info("banded: curve sidecar save failed", exc_info=True)

    def _probe_refinement_curve(self, cap=8, seed=7):
        """Worst-group relative residual after the direct mixed-precision
        solve and after each of `cap` refinement passes. One jitted
        refinement step re-executed eagerly cap times: a lax.scan(length=cap)
        version stacked (cap, G, Pp, nbord) Woodbury temps across iterations
        (3.3 GB x remat copies at 2048x512 — an HBM OOM at compile); the
        eager loop reuses one iteration's buffers and still lowers the solve
        body once."""
        import jax
        once = self._once_fn()
        exact_apply = self.exact_apply

        @jax.jit
        def direct_fn(arrs, R):
            scale = jnp.abs(R).max(axis=1)
            X = once(arrs, R)
            res = R - exact_apply(arrs['ex'], X)
            return X, res, (jnp.abs(res).max(axis=1) / scale).max()

        @jax.jit
        def refine_fn(arrs, R, X, res):
            scale = jnp.abs(R).max(axis=1)
            X = X + once(arrs, res)
            res = R - exact_apply(arrs['ex'], X)
            return X, res, (jnp.abs(res).max(axis=1) / scale).max()

        rng = np.random.default_rng(seed)
        R = jnp.asarray(rng.standard_normal((self.blocks.G, self.P)))
        arrs = self.solve_arrays()
        X, res, rel = direct_fn(arrs, R)
        rels = [rel]
        for _ in range(cap):
            X, res, rel = refine_fn(arrs, R, X, res)
            rels.append(rel)
        return np.asarray(jnp.stack(rels))

    def _once_fn(self):
        """Jit-safe single mixed-precision banded+Woodbury solve
        (arrs, R (G,P) in pencil coords) -> X (G,P)."""
        G = self.blocks.G
        Nb, nb = self.Nb, self.nb
        P, nbord, pad = self.P, self.nbord, self.pad
        bad_idx = self.bad_idx
        sweeps = _solve_sweeps_fn()

        def once(arrs, R):
            """One mixed-precision banded+Woodbury solve in pencil coords."""
            fac = arrs['fac']
            f32 = fac['RinvF' if 'RinvF' in fac else 'Rinv'].dtype
            # Scaled system: (Dr A Dc) (Dc^-1 x) = Dr r
            rflat = jnp.pad(R[:, arrs['row_perm']], ((0, 0), (0, pad)))
            rflat = rflat * arrs['Dr']
            rc = rflat.astype(f32).reshape(G, Nb, nb)
            if 'Mf_blk' in fac:
                y = block_tridiag_qr_solve_blocked_fac(fac, rc)
            elif 'Af' in fac:
                y = block_tridiag_qr_solve_prefix_fac(fac, rc)
            else:
                y = sweeps(fac['Qt'], fac['QtL'], fac['Rinv'],
                           fac['R1'], fac['R2'], rc)
            # Woodbury correction: factor_dtype column/row applies around the
            # f64 ill-conditioned core Sinv (see _ship_woodbury)
            if 'W1' in fac:     # all-f64 path (see _ship_woodbury)
                yflat = y.reshape(G, Nb * nb).astype(rflat.dtype)
                # Pinned-saddle trajectories are sensitive to the f64
                # contraction ORDER here (see _ship_woodbury); keep the
                # sequential-MAC matmul ordering for this branch only.
                mv = lambda A, v: jnp.matmul(A, v[..., None])[..., 0]
                t = mv(fac['Sinv'], mv(fac['Vfull'], yflat))
                x = yflat - mv(fac['W1'], t)
            else:
                y32 = y.reshape(G, Nb * nb)
                t = _bmv(fac['Sinv'],
                         _bmv(fac['Vfull'], y32).astype(jnp.float64))
                # (G, B, Pp) * (G, B, 1) summed over B: VPU form (see _bmv)
                if jax.default_backend() == 'cpu':
                    corr = jnp.einsum('gbp,gb->gp', fac['W1T'],
                                      t.astype(f32))
                else:
                    corr = (fac['W1T'] * t.astype(f32)[..., None]).sum(axis=1)
                x = y32.astype(rflat.dtype) - corr.astype(rflat.dtype)
                if 'illg' in fac:
                    # f64 fix-up for the k-local pinned / ill-capacitance
                    # groups (see _ship_woodbury): redo their correction
                    # with the f64 factor slices and overwrite those rows.
                    # Matmul (sequential-MAC) form, NOT _bmv: pinned-saddle
                    # trajectories are sensitive to the f64 contraction
                    # ORDER of this correction (same reason the all-f64
                    # branch above keeps matmul), and the ill-group slice
                    # is tiny so MXU padding cost is negligible.
                    ig = fac['illg']
                    yi = y32[ig].astype(jnp.float64)
                    mv64 = lambda A, v: jnp.matmul(A, v[..., None])[..., 0]
                    ti = mv64(fac['Sinv'][ig], mv64(fac['Vill'], yi))
                    ci = mv64(fac['W1ill'], ti)
                    x = x.at[ig].set((yi - ci).astype(x.dtype))
            if bad_idx:
                idx = jnp.asarray(bad_idx)
                xb = _bmv(arrs['Abad_inv'], rflat[idx, :P].astype(f32)
                          ).astype(rflat.dtype)
                x = x.at[idx, :P].set(xb)
                if pad:
                    x = x.at[idx, P:].set(0.0)
            x = x * arrs['Dc']
            return x[:, :P][:, arrs['col_unperm']]

        return once

    def solve_fn(self):
        """Return a jit-safe function (arrs, R (G,P)) -> X (G,P)."""
        refinements = self.refinements
        exact_apply = self.exact_apply
        once = self._once_fn()

        def solve(arrs, R):
            X = once(arrs, R)
            for _ in range(refinements):
                res = R - exact_apply(arrs['ex'], X)
                X = X + once(arrs, res)
            return X

        return solve

    def solve(self, R):
        if not hasattr(self, '_jit_solve'):
            self._jit_solve = jax.jit(self.solve_fn())
        return self._jit_solve(self.solve_arrays(), R)


class SeparableBandedOperator:
    """Exact f64 banded apply straight from the separable form
    A(g) = sum_p ghat[g]^p B_p (ref parity: the per-group expanded stacks of
    dedalus/core/subsystems.py:568-600, collapsed): ships the d+1
    G-INDEPENDENT split parts plus per-group weights instead of the
    weight-expanded (G, ...) stacks — O(Nb nb^2) matrix bytes instead of
    O(G Nb nb^2). At 2048x512 RBC that turns each exact f64 M/L apply from
    a ~2 GB block-stack read into a vector-traffic pass (~2.5 MB of shared
    blocks broadcast over groups), and it is the memory enabler for
    2048^2-scale refinement applies. Exceptional groups (per-stack `bad`)
    are overwritten from their exact banded stacks."""

    def __init__(self, parts, weights, order, nb, bad=None):
        # parts: list of BandedBlocks with G=1 (one per polynomial degree)
        self.parts = parts
        self.nparts = len(parts)
        b0 = parts[0]
        rp = np.asarray(order['row_perm'])
        cp = np.asarray(order['col_perm'])
        rinv = np.empty_like(rp)
        rinv[rp] = np.arange(rp.size)
        self.arrs = dict(w=jnp.asarray(np.asarray(weights)),
                         col_perm=jnp.asarray(cp),
                         row_unperm=jnp.asarray(rinv))
        self._part_keys = []
        for p, bb in enumerate(parts):
            d = bb.device_arrays(jnp.float64)
            self._part_keys.append(tuple(sorted(d)))
            for k, v in d.items():
                self.arrs[f'p{p}_{k}'] = v
        self._bad_keys = ()
        if bad:
            # bad: (bad_idx tuple, BandedBlocks over those groups)
            self.bad_idx, bad_blocks = bad
            self.arrs['badg'] = jnp.asarray(
                np.asarray(self.bad_idx, dtype=np.int32))
            dbad = bad_blocks.device_arrays(jnp.float64)
            self._bad_keys = tuple(sorted(dbad))
            for k, v in dbad.items():
                self.arrs[f'bad_{k}'] = v
        else:
            self.bad_idx = ()
        self.P = b0.P
        self.pad = b0.pad
        self.nbord = b0.nbord
        self.bcol0 = b0.bcol0
        self.G = np.asarray(weights).shape[0]

    def apply_fn(self):
        """Jit-safe (arrs, X (G,P)) -> (G,P)."""
        P, pad, nbord = self.P, self.pad, self.nbord
        bcol0 = self.bcol0
        nparts, part_keys = self.nparts, self._part_keys
        has_bad, bad_keys = bool(self.bad_idx), self._bad_keys

        def apply(arrs, X):
            xp = jnp.pad(X[:, arrs['col_perm']], ((0, 0), (0, pad)))
            y = None
            for p in range(nparts):
                mats = {k: arrs[f'p{p}_{k}'] for k in part_keys[p]}
                yp = arrs['w'][:, p, None] * apply_full(mats, xp, P, nbord,
                                                        bcol0)
                y = yp if y is None else y + yp
            if has_bad:
                bg = arrs['badg']
                mats = {k: arrs[f'bad_{k}'] for k in bad_keys}
                yb = apply_full(mats, xp[bg], P, nbord, bcol0)
                y = y.at[bg].set(yb)
            return y[:, :P][:, arrs['row_unperm']]

        return apply


class BandedOperator:
    """Exact f64 operator application in banded block form (for the M/L
    applies inside compiled steps: O(G nb P) HBM traffic instead of dense
    (G,P,P) stacks or separable-GEMM f64 flops)."""

    def __init__(self, blocks):
        self.blocks = blocks
        order = blocks.order
        rp = np.asarray(order['row_perm'])
        cp = np.asarray(order['col_perm'])
        rinv = np.empty_like(rp)
        rinv[rp] = np.arange(rp.size)
        self.arrs = blocks.device_arrays(jnp.float64)
        self.arrs['col_perm'] = jnp.asarray(cp)
        self.arrs['row_unperm'] = jnp.asarray(rinv)
        self.P = blocks.P
        self.pad = blocks.pad
        self.nbord = blocks.nbord
        self.G = blocks.G

    def apply_fn(self):
        """Jit-safe (arrs, X (G,P)) -> (G,P)."""
        P, pad, nbord = self.P, self.pad, self.nbord
        bcol0 = self.blocks.bcol0

        def apply(arrs, X):
            xp = jnp.pad(X[:, arrs['col_perm']], ((0, 0), (0, pad)))
            y = apply_full(arrs, xp, P, nbord, bcol0)
            return y[:, :P][:, arrs['row_unperm']]

        return apply
