"""Informative errors for missing optional dependencies.

The reference installs meta-path import hooks that explain how to
install cv2/torch/torchvision/torchmetrics (utils/imports.py:78-89).
This framework has no such hard deps -- jax/flax are required, and
torch / PIL / matplotlib / orbax are optional; `require` raises a
helpful error at the point of use."""
import importlib
from typing import Optional


_HINTS = {
    'torch': 'torch is only needed for porting PyTorch checkpoints '
             '(utils/torch_port.py); pip install torch --index-url '
             'https://download.pytorch.org/whl/cpu',
    'PIL': 'Pillow is only needed for *_pil visualization helpers; '
           'pip install Pillow',
    'matplotlib': 'matplotlib improves visualization colormaps; '
                  'pip install matplotlib',
    'orbax.checkpoint': 'orbax-checkpoint enables sharded pytree '
                        'checkpoints; pip install orbax-checkpoint '
                        '(a pickle fallback is used otherwise)',
}


def require(module_name: str, purpose: Optional[str] = None):
    """Import an optional dependency or raise with an actionable
    message."""
    try:
        return importlib.import_module(module_name)
    except ImportError as e:
        hint = _HINTS.get(module_name, '')
        msg = f"optional dependency '{module_name}' is required"
        if purpose:
            msg += f' for {purpose}'
        if hint:
            msg += f'. {hint}'
        raise ImportError(msg) from e
