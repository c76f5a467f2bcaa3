from .preprocessing import get_dummy_sample
from .batch import build_dummy_batch
