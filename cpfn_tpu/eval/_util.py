"""Shared eval-driver helpers."""

from __future__ import annotations

import functools

import jax

from cpfn_tpu.metrics import compute_all_metrics


def make_metrics_fn(classes):
    """Jitted compute_all_metrics with an eager fallback.

    The jit saves per-op dispatch over the TPU tunnel (hundreds of ops per
    cloud otherwise); on runtimes where large AOT executables occasionally
    come back malformed (remote-compile mode), the first failure flips this
    wrapper to eager mode permanently.
    """
    classes = tuple(classes)
    jitted = jax.jit(functools.partial(compute_all_metrics, classes=classes))
    state = {"use_jit": True}

    def call(*args):
        if state["use_jit"]:
            try:
                return jitted(*args)
            except Exception:
                state["use_jit"] = False
        return compute_all_metrics(*args, classes=classes)

    return call
