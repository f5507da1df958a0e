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
    )
    return ns
