"""cpfn_tpu — a TPU-native (JAX/XLA/Pallas) framework for cascaded primitive
fitting on high-resolution point clouds.

Re-implements the full capability surface of CPFN (Cascaded Primitive Fitting
Networks, ICCV 2021; reference: erictuanle/CPFN) with a TPU-first design:

- ``cpfn_tpu.ops``      — point-cloud geometry kernels (FPS, ball query, 3-NN,
                          grouping/interpolation) as XLA programs + Pallas kernels.
- ``cpfn_tpu.fitting``  — differentiable primitive fitting (weighted TLS with a
                          custom VJP, plane/sphere/cylinder/cone fitters).
- ``cpfn_tpu.losses``   — Hungarian-matched RIoU segmentation losses.
- ``cpfn_tpu.metrics``  — the 10-metric evaluation suite.
- ``cpfn_tpu.nn``       — PointNet++ backbone (set abstraction / feature
                          propagation) as pure-functional JAX modules.
- ``cpfn_tpu.merging``  — cross-scale instance fusion (similarity + greedy solver).
- ``cpfn_tpu.data``     — TraceParts HDF5 pipeline + synthetic data generators.
- ``cpfn_tpu.parallel`` — device-mesh sharding (data-parallel training,
                          patch-parallel cascade inference).
- ``cpfn_tpu.train`` / ``cpfn_tpu.eval`` — drivers for the three networks and
                          the cascaded evaluation pipeline.
- ``cpfn_tpu.native``   — C++ host library (Hungarian assignment, greedy merging,
                          host-side FPS) with pure-NumPy fallbacks.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("CPFN_PLATFORM"):
    # Hard platform override for subprocesses: the axon sitecustomize calls
    # jax.config.update("jax_platforms", "axon,...") at interpreter startup,
    # which silently overrides JAX_PLATFORMS from the environment — a
    # CPU-only helper subprocess (corpus gen, parity eval) would otherwise
    # attach to the TPU and contend with a training run. Setting
    # CPFN_PLATFORM=cpu forces it back before any backend initializes
    # (same dance as tests/conftest.py).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["CPFN_PLATFORM"])
