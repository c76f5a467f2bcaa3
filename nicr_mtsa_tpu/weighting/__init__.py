from .base import LossWeightingBase
from .dwa import DynamicWeightAverage
from .fixed import FixedLossWeighting
from .rlw import RandomLossWeighting
