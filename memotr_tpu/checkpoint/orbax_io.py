"""Native checkpointing via Orbax.

Replaces the reference's single-file ``torch.save`` of {model, optimizer,
scheduler, states} (``/root/reference/models/utils.py:15-45``) with an Orbax
checkpoint directory holding the same logical contents: parameter trees,
optimizer state, and the training-progress dict (start_epoch, global_iters).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    states: Optional[Dict] = None, frozen: Any = None):
    """Save to ``path`` (a directory). Rank-0 only in multi-host setups is
    handled by Orbax itself."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if frozen is not None:
        payload["frozen"] = frozen
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if states is not None:
        payload["states"] = {k: jax.numpy.asarray(v)
                             for k, v in states.items()}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: Any = None) -> Dict:
    """Load a checkpoint directory.  ``template`` (matching pytree of arrays)
    enables shape/dtype-checked restoration; without it the raw tree is
    returned."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)
