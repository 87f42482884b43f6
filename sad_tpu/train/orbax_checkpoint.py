"""Orbax-backed checkpointing (production-scale alternative backend).

The pickle checkpoints (sad_tpu.train.checkpoint) mirror the reference's
format and are the default; this backend adds what large-scale deployment
needs beyond the reference (SURVEY.md §5.4 lists only pickled dicts):
asynchronous saves that overlap training, retention policies, and sharded /
multi-host-safe array storage via orbax.

Selected with TRAIN.CHECKPOINT_BACKEND: 'orbax' — train_loop.train_model
then snapshots/finalizes through this manager (under
OUTPUT_DIR/checkpoints) and AUTO_RESUME restores from latest_step()
(tests/test_resume.py::test_orbax_backend_trains_and_resumes).
"""

from __future__ import annotations

import os
from typing import Any, Optional



class OrbaxCheckpointer:
    """Async checkpoint manager over {params, velocity, iter}."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, params: Any, velocity: Any = None) -> None:
        payload = {"params": params}
        if velocity is not None:
            payload["velocity"] = velocity
        self.manager.save(
            step, args=self._ocp.args.StandardSave(payload)
        )

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        """target: a pytree matching the saved payload's structure (e.g.
        freshly initialized {params, velocity}) — restoring against it is
        the safe orbax path; without it the handler falls back to the
        topology-guessing restore (warns, and shape drift goes undetected)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if target is not None:
            return self.manager.restore(
                step, args=self._ocp.args.StandardRestore(target)
            )
        return self.manager.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self) -> None:
        """Block until in-flight async saves complete."""
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()
