from . import merge_np
