"""Checkpoint format: pytree checkpoints via orbax (fallback: pickled
numpy trees).

The reference's format half is plain torch.save state dicts with
extensive key surgery on load (model/backbone/__init__.py:133-227);
here states are already pytrees, so saving/loading is structural.
The *policy* half (which metrics trigger a save) is
utils/checkpointing.CheckpointHelper. Host-side trainer state (DWA
buffers, epoch) rides along in `extra`."""
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict[str, Any],
                    extra: Optional[Dict[str, Any]] = None) -> str:
    """Save a train state (+ optional host-side extras)."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    try:
        import orbax.checkpoint as ocp
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.abspath(path), _to_numpy(state), force=True)
        if extra:
            with open(path + '.extra.pkl', 'wb') as f:
                pickle.dump(extra, f)
        return path
    except Exception:
        # fallback: single-file pickle of the numpy tree
        with open(path if path.endswith('.pkl') else path + '.pkl',
                  'wb') as f:
            pickle.dump({'state': _to_numpy(state), 'extra': extra}, f)
        return path


def _restructure(tree, target):
    """Rebuild `target`'s pytree structure (optax NamedTuple states,
    custom nodes) from a structurally-flattened checkpoint tree --
    orbax restores unknown node types as plain dicts/lists."""
    if target is None:
        return tree
    treedef = jax.tree_util.tree_structure(target)
    return jax.tree_util.tree_unflatten(
        treedef, jax.tree_util.tree_leaves(tree))


def load_checkpoint(path: str, target: Optional[Any] = None):
    """Load a checkpoint saved by `save_checkpoint`; returns
    (state, extra). Pass `target` (a state pytree of the expected
    STRUCTURE, e.g. a freshly-created train state) to restore
    container types orbax serializes structurally (optax NamedTuple
    optimizer states) -- without it they come back as plain dicts."""
    pkl = path if path.endswith('.pkl') else path + '.pkl'
    if os.path.isfile(pkl):
        with open(pkl, 'rb') as f:
            data = pickle.load(f)
        return _restructure(data['state'], target), data.get('extra')

    import orbax.checkpoint as ocp
    ckpt = ocp.PyTreeCheckpointer()
    state = ckpt.restore(os.path.abspath(path))
    extra = None
    if os.path.isfile(path + '.extra.pkl'):
        with open(path + '.extra.pkl', 'rb') as f:
            extra = pickle.load(f)
    return _restructure(state, target), extra


class StepCheckpointManager:
    """Preemption-safe training checkpoints: step-numbered directories,
    keep-last-N retention, async-friendly save, and resume via
    `latest_step` -- the TPU counterpart of the resume story the
    reference delegates to external trainers (its only in-repo pieces
    are the CSV re-read at logging.py:19-23 and {state_dict, optimizer,
    epoch} torch.save files, testing/model.py:12-23).

    Uses orbax's CheckpointManager when available (async save: the
    device->host copy happens at `save`, serialization continues in a
    background thread; `wait_until_finished` fences); falls back to
    synchronous `save_checkpoint` directories otherwise.
    """

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._max_to_keep = max_to_keep
        self._manager = None
        try:
            import orbax.checkpoint as ocp
            self._manager = ocp.CheckpointManager(
                self._dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, enable_async_checkpointing=True),
            )
        except Exception:
            pass

    # --- save ---------------------------------------------------------------
    def save(self, step: int, state: Dict[str, Any],
             extra: Optional[Dict[str, Any]] = None) -> None:
        if self._manager is not None:
            import orbax.checkpoint as ocp
            self._manager.save(
                step, args=ocp.args.StandardSave(_to_numpy(state)))
            if extra:
                with open(os.path.join(self._dir, f'extra_{step}.pkl'),
                          'wb') as f:
                    pickle.dump(extra, f)
            return
        save_checkpoint(os.path.join(self._dir, f'step_{step}'),
                        state, extra)

    def wait_until_finished(self) -> None:
        if self._manager is not None:
            self._manager.wait_until_finished()

    # --- resume -------------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        if self._manager is not None:
            return self._manager.latest_step()
        steps = []
        for name in os.listdir(self._dir):
            base = name.split('.')[0]
            if base.startswith('step_') and base[5:].isdigit():
                steps.append(int(base[5:]))
        return max(steps) if steps else None

    def restore(self, step: Optional[int] = None,
                target: Optional[Any] = None):
        """Restore (state, extra) at `step` (default: latest). Pass
        `target` (a state pytree of the expected structure) to get
        optax NamedTuple optimizer states back as NamedTuples instead
        of the plain dicts orbax deserializes."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None, None
        if self._manager is not None:
            state = self._manager.restore(step)
            extra = None
            extra_path = os.path.join(self._dir, f'extra_{step}.pkl')
            if os.path.isfile(extra_path):
                with open(extra_path, 'rb') as f:
                    extra = pickle.load(f)
            return _restructure(state, target), extra
        return load_checkpoint(os.path.join(self._dir, f'step_{step}'),
                               target=target)
