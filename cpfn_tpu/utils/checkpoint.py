"""Checkpointing via Orbax: params + BN state + optimizer state + step.

The reference saves only model weights (best-val `state_dict` + epoch
snapshots, `training_SPFN.py:107-115`) and restarts schedules from step 0 on
resume. Here the full training state round-trips, so resume continues the LR
and BN-momentum schedules exactly.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True),
    )


def save_checkpoint(
    directory: str, step: int, params, state, opt_state=None
) -> None:
    import orbax.checkpoint as ocp

    items = {
        "params": ocp.args.StandardSave(params),
        "state": ocp.args.StandardSave(state),
    }
    if opt_state is not None:
        items["opt_state"] = ocp.args.StandardSave(opt_state)
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.Composite(**items))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> int | None:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(
    directory: str, template: dict, step: int | None = None
):
    """template: {'params': ..., 'state': ..., optional 'opt_state': ...}
    pytrees with the right structure/shapes (e.g. freshly initialized). Only
    the requested items are restored (a checkpoint may carry more)."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    args = ocp.args.Composite(
        **{k: ocp.args.StandardRestore(v) for k, v in template.items()}
    )
    out = mgr.restore(step, args=args)
    mgr.close()
    # normalize to the default device: checkpoints written from mesh-
    # replicated training would otherwise restore as multi-device arrays and
    # poison later single-device jits with mixed shardings
    out = jax.device_put(dict(out), jax.devices()[0])
    return out, step
