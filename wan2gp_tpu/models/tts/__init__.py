"""TTS model families (reference models/TTS/)."""
