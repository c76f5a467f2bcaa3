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


def _check_leaf(value, target_leaf, path):
    value = np.asarray(value)
    t = np.asarray(target_leaf)
    if value.shape != t.shape or value.dtype != t.dtype:
        raise ValueError(
            f'checkpoint leaf {path!r} has shape/dtype '
            f'{value.shape}/{value.dtype}, expected {t.shape}/{t.dtype}'
        )
    return value


def _restructure(tree, target, path=''):
    """Rebuild `target`'s container types (optax NamedTuple states,
    tuples) from orbax's plain dict/list restoration, matching BY KEY.

    Never matches by flat leaf order: dicts flatten in sorted-key order
    while NamedTuples flatten in field order, so order-based
    unflattening silently permutes any state whose fields are not
    alphabetical (e.g. optax.MultiStepsState), and identical
    shapes (mu/nu) would mask the swap. Every leaf is shape/dtype
    checked against the target."""
    if target is None:
        return tree
    if tree is None:
        # orbax serializes leafless subtrees (optax EmptyState, empty
        # dicts) as None; the target already IS that empty structure
        return target
    if isinstance(target, tuple) and hasattr(target, '_fields'):
        if isinstance(tree, dict):
            vals = [_restructure(tree[name], getattr(target, name),
                                 f'{path}/{name}')
                    for name in target._fields]
        else:
            vals = [_restructure(v, t, f'{path}/{n}') for n, v, t in
                    zip(target._fields, tree, target)]
        return type(target)(*vals)
    if isinstance(target, dict):
        return {k: _restructure(tree[k], v, f'{path}/{k}')
                for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        if isinstance(tree, dict):    # orbax may key sequences '0'..'n'
            seq = [tree[str(i)] for i in range(len(target))]
        else:
            seq = list(tree)
        if len(seq) != len(target):
            raise ValueError(
                f'checkpoint node {path!r} has {len(seq)} entries, '
                f'expected {len(target)}')
        vals = [_restructure(v, t, f'{path}/{i}')
                for i, (v, t) in enumerate(zip(seq, target))]
        return type(target)(vals) if isinstance(target, list) \
            else tuple(vals)
    if hasattr(target, 'shape'):
        return _check_leaf(tree, target, path)
    return tree


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
            self._prune_extras(set(self._manager.all_steps()))
            return
        save_checkpoint(os.path.join(self._dir, f'step_{step}'),
                        state, extra)
        self._prune_fallback()

    def _prune_extras(self, kept_steps) -> None:
        """Drop extra_{step}.pkl files whose orbax step dir is gone."""
        for name in os.listdir(self._dir):
            if name.startswith('extra_') and name.endswith('.pkl'):
                step_str = name[len('extra_'):-len('.pkl')]
                if step_str.isdigit() and int(step_str) not in kept_steps:
                    os.remove(os.path.join(self._dir, name))

    def _prune_fallback(self) -> None:
        """keep-last-N for the no-orbax path: delete older step_* files
        (and their sidecars) beyond max_to_keep."""
        steps: Dict[int, list] = {}
        for name in os.listdir(self._dir):
            base = name.split('.')[0]
            if base.startswith('step_') and base[5:].isdigit():
                steps.setdefault(int(base[5:]), []).append(name)
        for step in sorted(steps)[:-self._max_to_keep or None]:
            for name in steps[step]:
                full = os.path.join(self._dir, name)
                if os.path.isdir(full):
                    import shutil
                    shutil.rmtree(full)
                else:
                    os.remove(full)

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
