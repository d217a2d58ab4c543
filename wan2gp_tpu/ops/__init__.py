from .norms import rms_norm, layer_norm, modulate
from .rope import build_rope_3d, apply_rope
from .attention import attention
