"""lavender-tpu: TPU-native video-language framework (LAVENDER capabilities)."""

__version__ = "0.1.0"
