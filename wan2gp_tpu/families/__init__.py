"""Family handler registry.

Each model family exposes a static handler class — the plugin contract
between the orchestrator and the models (the TPU analog of the reference's
`family_handler` classes, e.g. models/wan/wan_handler.py:69), trimmed to the
runtime concerns: query_supported_types / query_model_def / query_model_files
/ load_model / default_settings.
"""
from .wan import WanFamilyHandler
from .flux import FluxFamilyHandler
from .hyvideo import HunyuanFamilyHandler
from .ltxv import LTXVFamilyHandler
from .qwen import QwenImageFamilyHandler
from .krea2 import Krea2FamilyHandler
from .zimage import ZImageFamilyHandler
from .kandinsky5 import Kandinsky5FamilyHandler
from .minimax import MiniMaxFamilyHandler
from .ideogram4 import Ideogram4FamilyHandler
from .longcat import LongCatFamilyHandler
from .hidream import HiDreamFamilyHandler
from .magi import MagiFamilyHandler
from .ltx2 import LTX2FamilyHandler
from .tts_ace import ACEStepFamilyHandler
from .tts_qwen3 import Qwen3TTSFamilyHandler
from .tts_heartmula import HeartMulaFamilyHandler
from .tts_omnivoice import OmniVoiceFamilyHandler
from .tts_chatterbox import ChatterboxFamilyHandler
from .tts_yue import YuEFamilyHandler
from .tts_stable_audio3 import StableAudio3FamilyHandler
from .tts_kugelaudio import KugelAudioFamilyHandler
from .tts_ace15 import AceStep15FamilyHandler
from .tts_index2 import IndexTTS2FamilyHandler
from .ltx2_audio import LTXAudioTTSFamilyHandler

_HANDLER_CLASSES = [WanFamilyHandler, FluxFamilyHandler,
                    HunyuanFamilyHandler, LTXVFamilyHandler,
                    QwenImageFamilyHandler, Krea2FamilyHandler,
                    ZImageFamilyHandler, Kandinsky5FamilyHandler,
                    MiniMaxFamilyHandler, Ideogram4FamilyHandler,
                    LongCatFamilyHandler, HiDreamFamilyHandler,
                    MagiFamilyHandler, LTX2FamilyHandler,
                    ACEStepFamilyHandler, Qwen3TTSFamilyHandler,
                    HeartMulaFamilyHandler, OmniVoiceFamilyHandler,
                    ChatterboxFamilyHandler, YuEFamilyHandler,
                    StableAudio3FamilyHandler, KugelAudioFamilyHandler,
                    AceStep15FamilyHandler, IndexTTS2FamilyHandler,
                    LTXAudioTTSFamilyHandler]


def build_handler_map():
    handlers = {}
    for cls in _HANDLER_CLASSES:
        for t in cls.query_supported_types():
            handlers[t] = cls
    return handlers
