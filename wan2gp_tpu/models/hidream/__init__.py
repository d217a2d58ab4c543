from .model import HiDreamConfig, hidream_forward, init_hidream_extras
from .pipeline import HiDreamPipeline, HiDreamSamplingConfig
