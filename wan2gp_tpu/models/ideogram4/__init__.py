from .dit import Ideogram4Config, ideogram_forward, init_ideogram4
from .pipeline import Ideogram4Pipeline, PRESETS
