"""Helper to import the PyTorch reference implementation for parity tests.

The reference at /root/reference targets an old torch; we shim the handful of
APIs that moved (torch.solve) or that assume CUDA (Tensor.get_device) so its
pure-math modules run on CPU. Used only by tests; the library never depends
on it.
"""

import sys

REFERENCE_PATH = "/root/reference"


def load_reference():
    """Returns a namespace of reference SPFN modules, or None if unavailable."""
    try:
        import torch
    except ImportError:
        return None
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    # torch.solve is a removed-API stub that raises; replace unconditionally.
    def _solve(B, A):
        return torch.linalg.solve(A, B), None

    torch.solve = _solve
    # Reference calls .get_device() and then .to(device); on CPU get_device()
    # returns -1 which .to() rejects — remap to 'cpu'.
    _orig_get_device = torch.Tensor.get_device

    def _get_device(self):
        d = _orig_get_device(self)
        return "cpu" if (isinstance(d, int) and d < 0) else d

    torch.Tensor.get_device = _get_device
    _install_numba_stub()
    try:
        from SPFN import (  # noqa: F401
            differentiable_tls,
            geometry_utils,
            plane_fitter,
            sphere_fitter,
            cylinder_fitter,
            cone_fitter,
            losses_implementation,
            metric_implementation,
        )
        from Utils import merging_utils  # noqa: F401
    except Exception:
        return None
    import types

    ns = types.SimpleNamespace(
        torch=torch,
        differentiable_tls=differentiable_tls,
        geometry_utils=geometry_utils,
        plane_fitter=plane_fitter,
        sphere_fitter=sphere_fitter,
        cylinder_fitter=cylinder_fitter,
        cone_fitter=cone_fitter,
        losses_implementation=losses_implementation,
        metric_implementation=metric_implementation,
        merging_utils=merging_utils,
    )
    return ns


def _install_numba_stub():
    """numba is not in this environment; the reference's `Utils/merging_utils`
    only uses `@numba.jit(signature, nopython=True)` as a decorator. A stub
    whose jit is identity runs the reference's own Python source unmodified —
    numba's nopython mode preserves plain-NumPy semantics for this function,
    so the executed behavior is the reference's."""
    import sys
    import types

    import numpy as np

    if "numba" in sys.modules:
        return

    class _Sig:
        # numba.int64 appears both in jit signatures (int64[:], int64(...))
        # and as a NumPy dtype (np.arange(..., dtype=numba.int64)); NumPy
        # resolves objects through their `dtype` attribute.
        def __init__(self, np_dtype):
            self.dtype = np.dtype(np_dtype)

        def __getitem__(self, _):
            return self

        def __call__(self, *a, **k):
            return self

    stub = types.ModuleType("numba")
    stub.int64 = _Sig(np.int64)
    stub.float64 = _Sig(np.float64)

    def jit(*_a, **_k):
        def deco(fn):
            return fn

        return deco

    stub.jit = jit
    sys.modules["numba"] = stub
