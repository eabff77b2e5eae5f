"""Checkpoint / resume for long runs.

The reference has NO resume capability — only terminal-state JSON exports
(reference: simulation.py:160-168, ultimate_reality_engine.py:694-729) —
despite running 100k-tick experiments (omega_point_test.py:461-588). This
module adds genuine periodic checkpointing with Orbax (async-capable,
pytree-native) plus a plain-npz fallback, covering:

* ``ParticleState`` / ``BaselineState`` (direct engine),
* ``CosmoState`` (PM engines),
* arbitrary metadata (quantizer mode, config, tick, RNG keys).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    HAS_ORBAX = True
except Exception:  # pragma: no cover
    HAS_ORBAX = False


class CheckpointManager:
    """Periodic checkpoint writer/reader keyed by step number."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 use_orbax: Optional[bool] = None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        self.use_orbax = HAS_ORBAX if use_orbax is None else use_orbax
        if self.use_orbax:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True),
            )

    # -- save ---------------------------------------------------------------

    def save(self, step: int, state: Any, metadata: dict | None = None):
        """Save a pytree state + JSON metadata at `step`."""
        metadata = metadata or {}
        if self.use_orbax:
            self._mgr.save(step, args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
            ))
            self._mgr.wait_until_finished()
            (self.directory / str(step) / "meta.json").write_text(
                json.dumps(metadata, default=str))
        else:
            flat, treedef = jax.tree.flatten(state)
            np.savez(self.directory / f"ckpt_{step}.npz",
                     *[np.asarray(x) for x in flat])
            (self.directory / f"ckpt_{step}.meta.json").write_text(
                json.dumps({"metadata": metadata,
                            "treedef": str(treedef)}, default=str))
            self._prune_npz()

    def _prune_npz(self):
        ckpts = sorted(self.directory.glob("ckpt_*.npz"),
                       key=lambda p: int(p.stem.split("_")[1]))
        while len(ckpts) > self.max_to_keep:
            victim = ckpts.pop(0)
            victim.unlink(missing_ok=True)
            victim.with_suffix(".meta.json").unlink(missing_ok=True)

    # -- restore ------------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        if self.use_orbax:
            return self._mgr.latest_step()
        ckpts = sorted(self.directory.glob("ckpt_*.npz"),
                       key=lambda p: int(p.stem.split("_")[1]))
        return int(ckpts[-1].stem.split("_")[1]) if ckpts else None

    def restore(self, step: int, template: Any) -> Any:
        """Restore into the structure of `template` (a pytree with the
        target shapes/dtypes)."""
        if self.use_orbax:
            out = self._mgr.restore(step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
            ))
            return out["state"]
        data = np.load(self.directory / f"ckpt_{step}.npz")
        flat_t, treedef = jax.tree.flatten(template)
        flat = [jax.numpy.asarray(data[f"arr_{i}"])
                for i in range(len(flat_t))]
        return jax.tree.unflatten(treedef, flat)

    def restore_to_sharding(self, step: int, template: Any,
                            shardings: Any) -> Any:
        """Restore a checkpoint and place it under a device mesh.

        ``shardings`` is a pytree of ``jax.sharding.Sharding`` matching
        ``template`` (or a single Sharding applied to every leaf). The
        multi-chip resume path: a state saved from
        ``run_steps_sharded(gather=False)`` (or any sharded engine) comes
        back distributed over the target mesh — possibly a DIFFERENT
        mesh shape than it was saved from, which is what makes
        checkpoints portable across pod slices. (The reference has no
        resume at all — SURVEY §5.)"""
        state = self.restore(step, template)
        if hasattr(shardings, "device_set"):  # a single Sharding:
            # apply to array leaves; scalars (tick, redshift) stay host
            return jax.tree.map(
                lambda x: jax.device_put(x, shardings)
                if getattr(x, "ndim", 0) >= 1 else x, state)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), state, shardings)

    def load_metadata(self, step: int) -> dict:
        if self.use_orbax:
            p = self.directory / str(step) / "meta.json"
            return json.loads(p.read_text()) if p.exists() else {}
        p = self.directory / f"ckpt_{step}.meta.json"
        return (json.loads(p.read_text()).get("metadata", {})
                if p.exists() else {})


@dataclasses.dataclass
class ResumableRun:
    """Helper that wires a DirectSimulation to periodic checkpoints."""

    sim: Any
    manager: CheckpointManager
    checkpoint_every: int = 1000

    def run(self, total_ticks: int):
        """Run to total_ticks, resuming from the latest checkpoint."""
        latest = self.manager.latest_step()
        if latest is not None and latest > int(self.sim.state.tick):
            self.sim.state = self.manager.restore(latest, self.sim.state)
            print(f"  resumed from checkpoint at tick {latest}")
        while int(self.sim.state.tick) < total_ticks:
            chunk = min(self.checkpoint_every,
                        total_ticks - int(self.sim.state.tick))
            self.sim.step(chunk)
            self.manager.save(int(self.sim.state.tick), self.sim.state,
                              {"precision": self.sim.quantizer.mode.value})
        return self.sim
