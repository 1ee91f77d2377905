from compseed_tpu.index.fmindex import FMIndex  # noqa: F401
from compseed_tpu.index.build import build_index  # noqa: F401
