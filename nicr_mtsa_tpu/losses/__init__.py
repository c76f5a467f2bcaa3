from .base import LossBase
from .ce import CrossEntropyLossSemantic
from .elementwise import CosineEmbeddingLoss
from .elementwise import L1Loss
from .elementwise import MSELoss
from .vonmises import VonMisesLossBiternion
