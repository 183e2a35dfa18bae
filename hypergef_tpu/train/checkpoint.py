"""Checkpoint / resume (orbax) — a subsystem the reference lacks
entirely (SURVEY.md §5: models are trained from scratch each run).

Saves/restores (params, opt_state, step) with orbax; supports async
saving for minimal step-time impact on long runs.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def _mgr(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any,
    wait: bool = True,
    max_to_keep: int = 3,
) -> None:
    import orbax.checkpoint as ocp

    mgr = _mgr(directory, max_to_keep)
    mgr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            opt_state=ocp.args.StandardSave(opt_state),
        ),
    )
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(
    directory: str,
    params_template: Any,
    opt_state_template: Any,
    step: Optional[int] = None,
) -> Tuple[int, Any, Any]:
    """Restore the latest (or given) step; returns (step, params, opt_state).
    Raises FileNotFoundError when no checkpoint exists."""
    import orbax.checkpoint as ocp

    mgr = _mgr(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint under {directory}")
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_template),
            opt_state=ocp.args.StandardRestore(opt_state_template),
        ),
    )
    mgr.close()

    # Orbax may materialize restored leaves on the default device; put
    # each leaf back onto its template's sharding so distributed trainers
    # (mesh-sharded params/opt_state) resume with their mesh placement.
    def _resharded(template, value):
        def put(t, v):
            sharding = getattr(t, "sharding", None)
            return jax.device_put(v, sharding) if sharding is not None else v

        return jax.tree_util.tree_map(put, template, value)

    return (
        step,
        _resharded(params_template, restored["params"]),
        _resharded(opt_state_template, restored["opt_state"]),
    )
