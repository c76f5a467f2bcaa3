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


def load_checkpoint(path: str):
    """Load a checkpoint saved by `save_checkpoint`; returns
    (state, extra)."""
    pkl = path if path.endswith('.pkl') else path + '.pkl'
    if os.path.isfile(pkl):
        with open(pkl, 'rb') as f:
            data = pickle.load(f)
        return data['state'], data.get('extra')

    import orbax.checkpoint as ocp
    ckpt = ocp.PyTreeCheckpointer()
    state = ckpt.restore(os.path.abspath(path))
    extra = None
    if os.path.isfile(path + '.extra.pkl'):
        with open(path + '.extra.pkl', 'rb') as f:
            extra = pickle.load(f)
    return state, extra
