"""
Array and sparse-matrix helpers (parity: dedalus/tools/array.py).

The reference's hot kernels (apply_sparse along an axis, CSR matvec) map to
dense batched matmuls on TPU — `apply_matrix` here lowers to a jnp tensordot
that XLA tiles onto the MXU. The sparse constructors (block diag, kron,
permutations, interleave) remain scipy host-side utilities used during
matrix assembly.
"""

import numpy as np
from scipy import sparse


def apply_matrix(matrix, array, axis, **kw):
    """Apply a matrix along one axis of an array (parity: array.py:77).
    Works for numpy or jax inputs; sparse matrices are densified for the
    device path (TPU has no sparse matvec — the MXU wants dense tiles)."""
    if sparse.issparse(matrix):
        if isinstance(array, np.ndarray):
            return apply_sparse(matrix, array, axis)
        matrix = np.asarray(matrix.todense())
    import jax.numpy as jnp
    arr = jnp.asarray(array)
    out = jnp.tensordot(jnp.asarray(matrix), arr, axes=([1], [axis]))
    return jnp.moveaxis(out, 0, axis)


def apply_dense(matrix, array, axis, out=None):
    """Dense matrix application along an axis (parity: array.py:118)."""
    res = np.moveaxis(np.tensordot(np.asarray(matrix), np.asarray(array),
                                   axes=([1], [axis])), 0, axis)
    if out is not None:
        out[...] = res
        return out
    return res


def apply_sparse(matrix, array, axis, out=None):
    """Sparse matrix application along an axis (parity: array.py:156)."""
    arr = np.asarray(array)
    moved = np.moveaxis(arr, axis, 0)
    flat = moved.reshape(moved.shape[0], -1)
    res = matrix @ flat
    res = np.moveaxis(res.reshape((res.shape[0],) + moved.shape[1:]), 0, axis)
    if out is not None:
        out[...] = res
        return out
    return res


def sparse_block_diag(blocks, shape=None):
    """Sparse block-diagonal matrix from a list of blocks
    (parity: array.py:300)."""
    return sparse.block_diag(blocks, format='csr')


def kron(*factors):
    """Sparse Kronecker product of any number of factors
    (parity: array.py:325 nkron)."""
    out = None
    for f in factors:
        out = f if out is None else sparse.kron(out, f, format='csr')
    return out.tocsr()


nkron = kron


def perm_matrix(perm, M=None, source_index=False, sparse_format='csr'):
    """Permutation matrix (parity: array.py:356). By default perm[i] gives
    the DESTINATION row of source row i; source_index=True flips that."""
    perm = np.asarray(perm)
    N = perm.size
    M = N if M is None else M
    data = np.ones(N)
    if source_index:
        rows, cols = np.arange(N), perm
    else:
        rows, cols = perm, np.arange(N)
    return sparse.coo_matrix((data, (rows, cols)), shape=(M, M)).asformat(
        sparse_format)


def interleave_matrices(matrices):
    """Interleave len(matrices) square matrices into one matrix acting on
    interleaved data: out[k::S, j::S] = matrices[k][.., ..] (parity:
    array.py:447; used for grouped real-Fourier (cos, -sin) pairs)."""
    S = len(matrices)
    if S == 1:
        return matrices[0]
    N = matrices[0].shape[0]
    out = sparse.lil_matrix((N * S, N * S))
    for k, mat in enumerate(matrices):
        coo = sparse.coo_matrix(mat)
        out[coo.row * S + k, coo.col * S + k] = coo.data
    return out.tocsr()


def drop_empty_rows(mat):
    """Remove all-zero rows from a sparse matrix, returning (matrix, kept
    row indices) (parity: array.py:392)."""
    mat = sparse.csr_matrix(mat)
    nz = np.diff(mat.indptr) > 0
    keep = np.nonzero(nz)[0]
    return mat[keep], keep


def scipy_sparse_eigs(A, B, N, target, matsolver=None, left=False, **kw):
    """Shift-invert sparse eigensolve of A x = lambda B x around `target`
    (parity: array.py:398). Returns (eigenvalues, eigenvectors[, left])."""
    import scipy.sparse.linalg as spla
    A = sparse.csc_matrix(A).astype(np.complex128)
    B = sparse.csc_matrix(B).astype(np.complex128)
    C = (A - target * B).tocsc()
    solve = spla.factorized(C)

    def matvec(x):
        return solve(B @ x)

    op = spla.LinearOperator(A.shape, matvec=matvec, dtype=np.complex128)
    evals, evecs = spla.eigs(op, k=N, which='LM', **kw)
    evals = target + 1.0 / evals
    if not left:
        return evals, evecs
    solveH = spla.factorized(C.conj().T.tocsc())

    def matvecH(x):
        return B.conj().T @ solveH(x)

    opH = spla.LinearOperator(A.shape, matvec=matvecH, dtype=np.complex128)
    evalsL, evecsL = spla.eigs(opH, k=N, which='LM', **kw)
    evalsL = target + 1.0 / np.conj(evalsL)
    return evals, evecs, evalsL, evecsL
