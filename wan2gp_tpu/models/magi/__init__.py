from .dit import MagiConfig, magi_forward, init_magi
from .pipeline import MagiPipeline, MagiSamplingConfig
