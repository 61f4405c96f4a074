"""Critical-error handling: cooperative abort with full state dump.

TPU-native re-design of `mpas_seaice_error.F` (seaice_check_critical_
error :80 — max-reduce an abort flag across ranks, write the abort
stream, halt) and the Registry abort/abort_block crash-dump streams
(Registry.xml:2163-2248): the abort decision comes from the jit-able
`diagnostics.check_state`; on failure the full State pytree plus the
failing-check list is dumped bitwise before raising.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax

from .diagnostics import check_state
from .model import State


class SeaIceAbort(RuntimeError):
    """Raised after a failed state check; the dump path is attached."""

    def __init__(self, message: str, dump_path: Optional[str]):
        super().__init__(message)
        self.dump_path = dump_path


def write_abort_dump(run_dir: str, state: State, timestamp: str,
                     failed_checks) -> str:
    """Write the crash-dump 'abort stream' (full prognostic state +
    metadata), mirroring config_full_abort_write (Registry :356-359)."""
    from .io.checkpoint import save_checkpoint
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, f"abort.{timestamp}.npz")
    save_checkpoint(path, state, {
        "failed_checks": np.array([str(f) for f in failed_checks])})
    return path


def raise_on_failed_checks(checks: Dict[str, Any], state: State,
                           timestamp: str,
                           run_dir: Optional[str] = None) -> None:
    """Host abort gate for checks already computed on-device (inside
    the jitted step — the per-step seaice_check_state analog)."""
    checks = jax.device_get(checks)
    if bool(np.all(checks["ok"])):
        return
    failed = [k for k, v in checks.items()
              if k != "ok" and not bool(np.all(v))]
    dump = None
    if run_dir is not None:
        dump = write_abort_dump(run_dir, state, timestamp, failed)
    raise SeaIceAbort(
        f"critical state-check failure at {timestamp}: {failed}"
        + (f" (state dumped to {dump})" if dump else ""), dump)


def check_critical_error(state: State, timestamp: str,
                         run_dir: Optional[str] = None,
                         max_velocity: float = 5.0) -> None:
    """Host-side abort gate: evaluate the state checks; on failure dump
    the state and raise SeaIceAbort. Under shard_map the checks reduce
    over all shards automatically (jnp.all over the stacked axis), the
    analog of the reference's dmpar max-reduce of abortFlag."""
    checks = jax.device_get(check_state(state,
                                        max_velocity=max_velocity))
    if bool(np.all(checks["ok"])):
        return
    failed = [k for k, v in checks.items()
              if k != "ok" and not bool(np.all(v))]
    dump = None
    if run_dir is not None:
        dump = write_abort_dump(run_dir, state, timestamp, failed)
    raise SeaIceAbort(
        f"critical state-check failure at {timestamp}: {failed}"
        + (f" (state dumped to {dump})" if dump else ""), dump)
