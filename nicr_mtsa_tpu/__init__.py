"""nicr-mtsa-tpu: TPU-native multi-task RGB-D scene analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TUI-NICR/nicr-multitask-scene-analysis (see /root/reference): panoptic
segmentation (semantic + bottom-up instance), instance orientation
estimation, surface-normal estimation, scene classification, and dense
visual embedding prediction -- built TPU-first:

- NHWC layouts and bf16 matmuls everywhere (MXU-friendly),
- static shapes with padded K-instance tables instead of ragged lists,
- postprocessing (keypoint NMS, offset-vote grouping, panoptic merge)
  as fused on-device XLA programs instead of CPU Python loops,
- metrics accumulated in device memory and reduced with `lax.psum`
  over a `jax.sharding.Mesh` instead of torchmetrics + NCCL,
- pure-function train/eval steps compiled with `jit` over the mesh.

Reference parity map: docstrings throughout cite the reference files
(`<path>:<lines>` relative to the reference repo src root) whose
behavior each component reproduces.
"""

__version__ = '0.1.0'

from . import data
from . import losses
from . import metrics
from . import models
from . import ops
from . import parallel
from . import pipeline
from . import postprocessing
from . import tasks
from . import utils
from . import visualization
from . import weighting

from .multi_task import EnabledTasksInTheOrderTheyAppearInPredictions
from .multi_task import KNOWN_TASKS
