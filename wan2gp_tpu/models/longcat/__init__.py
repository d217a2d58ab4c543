from .dit import LongCatConfig, longcat_forward, init_longcat
from .pipeline import LongCatPipeline, LongCatSamplingConfig
