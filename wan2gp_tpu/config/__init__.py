from .registry import ModelRegistry, get_base_model_type
